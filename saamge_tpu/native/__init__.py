"""Native (C++) host components, built lazily with the system toolchain.

The reference's host-side native pieces (METIS partitioning; part.cpp) are
re-provided here as small C++ shared libraries bound through ctypes — no
pybind11/pip requirements.  Build artifacts are cached next to the sources
and keyed by a source-content hash (a stale or foreign-arch binary — built
with -march=native elsewhere — is never loaded).
"""

from __future__ import annotations

import ctypes
import hashlib
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
    stamp = os.path.join(_DIR, f"lib{name}.so.hash")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if os.path.exists(so) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == digest:
                return so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", so, src]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(stamp, "w") as f:
        f.write(digest)
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
