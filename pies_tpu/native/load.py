"""ctypes loader for the native (C++) scene-build components.

The reference's runtime is native end-to-end; here the per-step hot path is
XLA-compiled, and the host-side scene-build stage (tetrahedralization,
analogous to the reference's tetgen import at
``PrimitiveUtilities.cpp:183-241``) is C++ (``tetmesh.cpp``), built by
``build.sh`` into ``libpies_native.so`` and bound via ``ctypes``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpies_native.so")
_cached = None
_checked = False


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.pies_tetrahedralize.restype = ctypes.c_int
        lib.pies_tetrahedralize.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # vertices
            ctypes.c_int,  # num_vertices
            ctypes.POINTER(ctypes.c_int),  # tris
            ctypes.c_int,  # num_tris
            ctypes.c_int,  # resolution
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # out points
            ctypes.POINTER(ctypes.c_int),  # out num_points
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),  # out tets
            ctypes.POINTER(ctypes.c_int),  # out num_tets
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),  # out surface
            ctypes.POINTER(ctypes.c_int),  # out num_surface
        ]
        lib.pies_free.restype = None
        lib.pies_free.argtypes = [ctypes.c_void_p]

    def tetrahedralize(self, vertices: np.ndarray, tris: np.ndarray, resolution: int):
        vertices = np.ascontiguousarray(vertices, np.float32)
        tris = np.ascontiguousarray(tris, np.int32)
        out_pts = ctypes.POINTER(ctypes.c_float)()
        out_tets = ctypes.POINTER(ctypes.c_int)()
        out_surf = ctypes.POINTER(ctypes.c_int)()
        n_pts = ctypes.c_int()
        n_tets = ctypes.c_int()
        n_surf = ctypes.c_int()
        rc = self._lib.pies_tetrahedralize(
            vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vertices.shape[0],
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            tris.shape[0],
            resolution,
            ctypes.byref(out_pts),
            ctypes.byref(n_pts),
            ctypes.byref(out_tets),
            ctypes.byref(n_tets),
            ctypes.byref(out_surf),
            ctypes.byref(n_surf),
        )
        if rc != 0:
            raise ValueError(f"pies_tetrahedralize failed (code {rc})")
        try:
            points = np.ctypeslib.as_array(out_pts, (n_pts.value, 3)).copy()
            tets = np.ctypeslib.as_array(out_tets, (n_tets.value, 4)).copy()
            surface = np.ctypeslib.as_array(out_surf, (n_surf.value, 3)).copy()
        finally:
            self._lib.pies_free(out_pts)
            self._lib.pies_free(out_tets)
            self._lib.pies_free(out_surf)
        return points, tets, surface


def _build() -> bool:
    """Compile the library from source (the .so is not under version
    control — it is host-specific and unverifiable in review)."""
    import subprocess

    script = os.path.join(os.path.dirname(__file__), "build.sh")
    try:
        proc = subprocess.run(
            ["sh", script], capture_output=True, text=True, timeout=300
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    return proc.returncode == 0 and os.path.exists(_LIB_PATH)


def try_load() -> _Native | None:
    """Load the native library, building it from ``tetmesh.cpp`` on first
    use; returns None (NumPy fallback engages) when no toolchain exists."""
    global _cached, _checked
    if _checked:
        return _cached
    _checked = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        _cached = _Native(ctypes.CDLL(_LIB_PATH))
    except OSError:
        _cached = None
    return _cached
