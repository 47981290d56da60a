"""Native (C++) host components, compiled on demand with g++ and loaded via
ctypes (this image has no pybind11; see repo build notes)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def load(name: str, sources: list[str], link: list[str] = ()) -> ctypes.CDLL:
    """Compile (if stale) and load lib<name>.so from the given sources."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so_path = os.path.join(_DIR, f"lib{name}.so")
        srcs = [os.path.join(_DIR, s) for s in sources]
        stale = (not os.path.exists(so_path) or
                 any(os.path.getmtime(s) > os.path.getmtime(so_path) for s in srcs))
        if stale:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-o", so_path] + srcs + list(link)
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        _LIBS[name] = lib
        return lib
