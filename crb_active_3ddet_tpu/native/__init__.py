"""Native (C++) runtime components, built on demand with g++ and loaded via
ctypes (no pybind11 in this environment)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent
_LIBS: dict = {}


def load_library(name: str) -> ctypes.CDLL:
    """Compile (if needed) and load lib<name>.so from <name>.cpp."""
    if name in _LIBS:
        return _LIBS[name]
    src = _NATIVE_DIR / f'{name}.cpp'
    lib_path = _NATIVE_DIR / f'lib{name}.so'
    if (not lib_path.exists()
            or lib_path.stat().st_mtime < src.stat().st_mtime):
        cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
               '-std=c++17', str(src), '-o', str(lib_path)]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(lib_path))
    _LIBS[name] = lib
    return lib
