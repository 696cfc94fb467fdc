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


TRAIN_WORKER = """
import sys
from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()
import jax
import numpy as np
from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader
from automatic_speech_recognition_tpu.parallel.distributed import maybe_initialize
from automatic_speech_recognition_tpu.parallel.mesh import make_mesh
from automatic_speech_recognition_tpu.training import trainer

assert maybe_initialize() is True
shard_dir = sys.argv[1]
cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
             enc_units=16, num_enc_channels=4, num_enc_layers=1,
             dec_units=16, num_dec_layers=1, embedding_size=8,
             attention_size=8, mode="add", dropout_rate=0.0,
             scheduled_sampling=False, lr=1e-3,
             bucket_boundaries_train=(64,), bucket_batch_sizes=(4,),
             max_tokenlen_train=16, token_pad_quantum=8)
loader = BucketedLoader([shard_dir + "/train-1.arsh"], cfg,
                        is_training=True, seed=7,
                        part_index=jax.process_index(),
                        part_count=jax.process_count())
it = iter(loader)
first = next(it)
assert first[0].shape[0] == 2, first[0].shape  # local rows = 4 global / 2
mesh = make_mesh(num_partitions=1)
ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
step_fn, ts, shard_batch = trainer.make_mesh_train_step(mesh, ts, first, cfg)
losses = []
for batch in [first, next(it)]:
    g = shard_batch(batch)
    assert g[0].shape[0] == 4, g[0].shape  # stitched back to global batch
    ts, m = step_fn(ts, g)
    losses.append(float(jax.device_get(m["loss"])))
print("TRAINOK", jax.process_index(), " ".join(f"{l:.6f}" for l in losses))

# Checkpointing is a global collective (orbax save/restore contain
# cross-process barriers), so EVERY process must call it; the overwrite
# path (backup rename on primary + explicit barriers) must not deadlock
# either.  This is exactly the multi-host bug class a primary-only
# ckpt.save would reintroduce.
from automatic_speech_recognition_tpu.training.checkpoint import (
    CheckpointManager)
host_ts = jax.device_get(ts)   # params/opt state replicated -> addressable
ckpt = CheckpointManager(sys.argv[2])
ckpt.save(1, host_ts)
ckpt.save(1, host_ts)          # overwrite: rename-aside + barrier path
restored = ckpt.restore(host_ts, epoch=1)
assert restored is not None
assert int(restored.step) == int(host_ts.step)
ckpt.close()
print("CKPTOK", jax.process_index())
"""


def test_two_process_training_step_matches_single(tmp_path):
    """Two CPU processes train over the partitioned loader; every process
    must see the same global loss, and it must equal the single-process
    loss on the same global batches (the multi-host input path changes
    WHERE rows are assembled, never the math)."""
    import numpy as np

    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader
    from automatic_speech_recognition_tpu.data.shards import write_shard

    rng = np.random.default_rng(3)
    feats = [rng.standard_normal((int(t), 8, 3)).astype(np.float32)
             for t in rng.integers(24, 56, 8)]
    toks = [list(rng.integers(3, 29, int(n))) + [2]
            for n in rng.integers(4, 10, 8)]
    write_shard(str(tmp_path / "train-1.arsh"), feats, toks)

    port = _free_port()
    base = dict(os.environ)
    base.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + base.get("PYTHONPATH", "").split(os.pathsep)),
    })
    def run_pair():
        procs = []
        for i in range(2):
            env = dict(base, JAX_PROCESS_ID=str(i))
            procs.append(subprocess.Popen(
                [sys.executable, "-c", TRAIN_WORKER, str(tmp_path),
                 str(tmp_path / "ckpt")], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        return procs, [p.communicate(timeout=600)[0] for p in procs]

    procs, outs = run_pair()
    # Gloo's KV-store handshake has a hard 30 s timeout inside XLA; on a
    # loaded 1-core host the second process can miss it (observed while a
    # training chain owned the box).  One retry absorbs that specific
    # infra flake without weakening any correctness assertion.
    if (any(p.returncode != 0 for p in procs)
            and any("DEADLINE_EXCEEDED" in o for o in outs)):
        procs, outs = run_pair()
    dist_losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "CKPTOK" in out, out
        line = [l for l in out.splitlines() if l.startswith("TRAINOK")][0]
        dist_losses.append([float(x) for x in line.split()[2:]])
    assert dist_losses[0] == dist_losses[1], dist_losses

    # single-process reference on the same global batches
    import jax
    from automatic_speech_recognition_tpu.training import trainer
    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
                 enc_units=16, num_enc_channels=4, num_enc_layers=1,
                 dec_units=16, num_dec_layers=1, embedding_size=8,
                 attention_size=8, mode="add", dropout_rate=0.0,
                 scheduled_sampling=False, lr=1e-3,
                 bucket_boundaries_train=(64,), bucket_batch_sizes=(4,),
                 max_tokenlen_train=16, token_pad_quantum=8)
    loader = BucketedLoader([str(tmp_path / "train-1.arsh")], cfg,
                            is_training=True, seed=7)
    it = iter(loader)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    ref = []
    for batch in [next(it), next(it)]:
        ts, m = trainer.train_step(ts, tuple(batch), cfg,
                                   dec_steps=batch[2].shape[1])
        ref.append(float(m["loss"]))
    np.testing.assert_allclose(dist_losses[0], ref, rtol=2e-5)


def test_loader_partition_rows(tmp_path):
    """part_index/part_count slice each global batch into disjoint,
    order-preserving row blocks whose concatenation is the full batch."""
    import numpy as np

    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader
    from automatic_speech_recognition_tpu.data.shards import write_shard

    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((32, 4, 3)).astype(np.float32)
             for _ in range(8)]
    toks = [list(rng.integers(3, 29, 5)) + [2] for _ in range(8)]
    write_shard(str(tmp_path / "train-1.arsh"), feats, toks)
    cfg = Config(feat_dim=4, bucket_boundaries_train=(64,),
                 bucket_batch_sizes=(4,), max_tokenlen_train=16,
                 token_pad_quantum=8)
    fn = str(tmp_path / "train-1.arsh")
    full = next(iter(BucketedLoader([fn], cfg, seed=5)))
    parts = [next(iter(BucketedLoader([fn], cfg, seed=5,
                                      part_index=i, part_count=2)))
             for i in range(2)]
    for c in range(4):
        np.testing.assert_array_equal(
            np.concatenate([parts[0][c], parts[1][c]]), full[c])
    import pytest
    with pytest.raises(ValueError):
        BucketedLoader([fn], cfg, is_training=False, part_index=0,
                       part_count=2)
    with pytest.raises(ValueError):
        BucketedLoader([fn], cfg, part_index=2, part_count=2)


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
