"""Shared scaffolding for loading the repo's native C++ libraries.

Both wrappers (flac.py, shards_native.py) build their .so on first use via
the native/ Makefile and latch failures so a broken toolchain costs one
`make` attempt per process, not one per call.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_lock = threading.Lock()
_libs: Dict[str, Optional[ctypes.CDLL]] = {}


def load_native(lib_name: str,
                configure: Callable[[ctypes.CDLL], None]
                ) -> Optional[ctypes.CDLL]:
    """Build (if needed) and load native/<lib_name>; None if unavailable.
    `configure` sets argtypes/restypes on first load."""
    with _lock:
        if lib_name in _libs:
            return _libs[lib_name]
        path = os.path.join(NATIVE_DIR, lib_name)
        try:
            # always invoke make: its dependency tracking makes an
            # up-to-date build a no-op, and a checkout with a stale .so
            # (gitignored artifact) picks up C++ source changes instead of
            # silently running old native code.  If make is unavailable
            # but a .so exists, fall back to loading it as-is.
            try:
                subprocess.run(["make", "-C", NATIVE_DIR, lib_name],
                               check=True, capture_output=True)
            except (OSError, subprocess.SubprocessError):
                if not os.path.exists(path):
                    raise
            lib = ctypes.CDLL(path)
            configure(lib)
        except (OSError, subprocess.SubprocessError):
            lib = None
        _libs[lib_name] = lib
        return lib
