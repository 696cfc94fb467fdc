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

    No-op when the env expresses no preference or the backend is already
    initialized (then JAX itself warns about late config changes)."""
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
