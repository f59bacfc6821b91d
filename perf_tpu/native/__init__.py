"""Native (C++) runtime components, loaded via ctypes.

The reference's only executed native code lives in external CUDA libraries;
its host-side hot spots (the annealing tour, IO) are plain Python. Here the
host-side workhorses are C++ with lazy in-tree compilation (g++ is in the
image; pybind11 is not, so the ABI is plain C via ctypes). Every native
entry point has a NumPy fallback so the framework degrades gracefully on
machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIBS: dict = {}


def _build_and_load(name: str):
    """Compile <name>.cpp into lib<name>.so (cached) and dlopen it."""
    if name in _LIBS:
        return _LIBS[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    lib_path = os.path.join(_DIR, f"lib{name}.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", lib_path, src],
            check=True, capture_output=True)
    lib = ctypes.CDLL(lib_path)
    _LIBS[name] = lib
    return lib


def solve_tour(positions: np.ndarray, n_steps: int = 10000,
               seed: int = 0) -> np.ndarray:
    """Anchor-tour ordering via native simulated annealing; NumPy fallback."""
    positions = np.ascontiguousarray(positions, dtype=np.float32)
    n = positions.shape[0]
    try:
        lib = _build_and_load("tour")
        lib.solve_tour.restype = ctypes.c_double
        order = np.empty(n, dtype=np.int64)
        lib.solve_tour(
            positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n), ctypes.c_int64(n_steps),
            ctypes.c_uint64(seed or 1),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return order
    except Exception:
        return _solve_tour_numpy(positions, n_steps, seed)


def _solve_tour_numpy(positions: np.ndarray, n_steps: int,
                      seed: int) -> np.ndarray:
    """Reference-faithful Python annealing
    (``dense_travel_pose_sampler.py:26-48``)."""
    rng = np.random.default_rng(seed)
    n = len(positions)
    order = np.arange(n)

    def length(o):
        return float(np.linalg.norm(
            positions[o[:-1]] - positions[o[1:]], axis=-1).sum())

    best = length(order)
    for step in range(n_steps):
        a, b = rng.integers(n), rng.integers(n)
        cand = order.copy()
        cand[a], cand[b] = cand[b], cand[a]
        new = length(cand)
        ratio = (1.0 - step / n_steps) ** 5
        if new < best or rng.random() < ratio:
            order, best = cand, new
    return order
