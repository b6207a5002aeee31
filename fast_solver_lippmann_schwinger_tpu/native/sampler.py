"""ctypes loader for the native kernel sampler, with SciPy fallback.

The shared library is built lazily with g++ -O3 -fopenmp on first use and
cached next to this file.  If no compiler is available the SciPy path is used
(identical results; the native path exists for setup-time throughput parity
with the reference's multi-process ``sampleGkernelpar``,
``src/FastConvolution.jl:337-401``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "hankel_sampler.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_hankel_sampler.so")


def _load_library():
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                        "-fPIC", "-std=c++17", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.sample_hankel0_kernel.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.sample_helmholtz3d_kernel.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            _LIB = lib
        except (OSError, subprocess.CalledProcessError):
            _LIB_FAILED = True
        return _LIB


def hankel_kernel_table(k: float, r: np.ndarray, h: float) -> np.ndarray:
    """(i/4) h^2 H0^(1)(k r), elementwise over r (any shape), complex128."""
    lib = _load_library()
    r = np.ascontiguousarray(r, dtype=np.float64)
    if lib is not None:
        out = np.empty(r.shape + (2,), dtype=np.float64)
        lib.sample_hankel0_kernel(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            r.size,
            float(k),
            0.0,
            0.25 * h * h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.view(np.complex128).reshape(r.shape)
    from scipy.special import hankel1

    return (0.25j * h * h) * hankel1(0, k * r)


def helmholtz3d_kernel_table(k: float, r: np.ndarray, h: float) -> np.ndarray:
    """exp(i k r) h^2 / (4 pi r), elementwise, complex128."""
    lib = _load_library()
    r = np.ascontiguousarray(r, dtype=np.float64)
    if lib is not None:
        out = np.empty(r.shape + (2,), dtype=np.float64)
        lib.sample_helmholtz3d_kernel(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            r.size,
            float(k),
            h * h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.view(np.complex128).reshape(r.shape)
    return np.exp(1j * k * r) * (h * h) / (4.0 * np.pi * r)
