"""Multi-process initialization smoke: parallel/distributed.maybe_initialize
must wire jax.distributed from explicit coordinator env vars so that
jax.devices() spans every process (the TPU-pod replacement for the
reference's single hardcoded device, train.py:23).

Runs TWO real CPU processes against one coordinator — the standard
multi-host stand-in when no pod is available.
"""

import os
import socket
import subprocess
import sys

WORKER = """
from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # the axon TPU plugin would otherwise override cpu
import jax
from automatic_speech_recognition_tpu.parallel.distributed import (
    maybe_initialize, is_primary)
assert maybe_initialize() is True, "distributed init did not trigger"
assert maybe_initialize() is True, "second call must be an idempotent no-op"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() > jax.local_device_count(), (
    jax.device_count(), jax.local_device_count())
assert is_primary() == (jax.process_index() == 0)
print("DISTOK", jax.process_index(), jax.device_count())
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_distributed_smoke():
    port = _free_port()
    base = dict(os.environ)
    base.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        # one local CPU device per process so global > local is meaningful
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + base.get("PYTHONPATH", "").split(os.pathsep)),
    })
    procs = []
    for i in range(2):
        env = dict(base, JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "DISTOK" in out, out


def test_single_process_is_noop():
    """Without coordinator env vars maybe_initialize must decline."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_COORDINATOR", "JAX_NUM_PROC",
                                "JAX_PROCESS_ID"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    code = ("from automatic_speech_recognition_tpu.parallel.distributed "
            "import maybe_initialize; assert maybe_initialize() is False; "
            "print('NOOPOK')")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "NOOPOK" in out.stdout
