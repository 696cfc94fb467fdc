"""Platform-selection helper for CLI entry points.

Some TPU plugins (e.g. the tunneled dev platform on this image) register
themselves regardless of the JAX_PLATFORMS environment variable, so a user
running `JAX_PLATFORMS=cpu python train.py ...` would silently end up on
the remote TPU.  `honor_platform_env()` re-asserts the user's choice
through jax.config BEFORE the backend is frozen; call it at the top of
every CLI script, before anything touches a jax array.

(The reference hardcodes CUDA_VISIBLE_DEVICES per script instead,
train.py:23 / test.py:24 / decode.py:24.)
"""

from __future__ import annotations

import os

# exit code for "the platform failed, not the program" — supervisors
# (tools/train_supervised.sh) retry on this and on the stall watchdog's
# 17 (utils/watchdog.py:STALL_EXIT_CODE) but NOT on real errors
TRANSIENT_EXIT_CODE = 18

# substrings that mark a gRPC/backend failure as transient in the sense
# that a later retry can succeed (dead tunnel, preempted remote service,
# coordinator hiccup) — matched case-sensitively against the exception
# chain's messages
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Unable to initialize backend",
    "failed to connect",
    "Connection reset",
    "Socket closed",
)


def is_transient_platform_error(exc: BaseException) -> bool:
    """True when the exception chain looks like a dead/flaky device
    platform rather than a bug: a supervisor should retry, not a human
    debug.  Walks __cause__/__context__ so wrapped RuntimeErrors (e.g.
    jax's "Unable to initialize backend" re-raise) classify too."""
    seen = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        msg = str(e)
        if any(m in msg for m in _TRANSIENT_MARKERS):
            return True
        e = e.__cause__ or e.__context__
    return False


def exit_for_transient_errors(main_fn, argv=None):
    """Run a CLI main(); convert transient platform failures into
    sys.exit(TRANSIENT_EXIT_CODE) so supervisors can distinguish
    "retry me" (17 stall / 18 transient) from genuine errors (1)."""
    import logging
    import sys
    try:
        return main_fn(argv)
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        if is_transient_platform_error(e):
            first_line = (str(e).splitlines() or [""])[0]
            logging.getLogger("platform").error(
                "transient platform failure (%s: %s) — exiting %d so a "
                "supervisor can retry", type(e).__name__,
                first_line[:200], TRANSIENT_EXIT_CODE)
            sys.exit(TRANSIENT_EXIT_CODE)
        raise


def honor_platform_env() -> None:
    """Force the platform named in JAX_PLATFORMS (or imply 'cpu' when a
    host-platform device-count XLA flag is set) via jax.config.

    Also enables the persistent compilation cache (every CLI calls this
    first, so one call site covers all entry points).

    No-op when the env expresses no preference or the backend is already
    initialized (then JAX itself warns about late config changes)."""
    enable_compilation_cache()
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want and "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        want = "cpu"
    if not want:
        return
    try:
        import jax
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already up; keep whatever it has


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache shared across CLI processes.

    Every entry point (train/test/decode/serve) is its own process, so
    without this each run re-pays the full compile — minutes per program
    on remote-compile platforms like the tunneled dev TPU.  The cache dir
    is ASR_COMPILATION_CACHE (default ~/.cache/asr_tpu_xla); set it to
    '0'/'off' to disable.  Safe no-op on backends that cannot serialize
    executables (JAX warns and skips caching)."""
    where = os.environ.get("ASR_COMPILATION_CACHE",
                           os.path.expanduser("~/.cache/asr_tpu_xla"))
    if where.lower() in ("0", "off", "none", ""):
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", where)
        # cache everything that took meaningful time to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: run uncached
