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
