"""Native (C++) host components, built lazily with the system toolchain.

The reference's host-side native pieces (METIS partitioning; part.cpp) are
re-provided here as small C++ shared libraries bound through ctypes — no
pybind11/pip requirements.  Build artifacts are cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", so, src]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def load(name: str) -> Optional[ctypes.CDLL]:
    """Build (if needed) and load libname.so; returns None if the toolchain
    is unavailable so callers can fall back to pure Python."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib
