"""Raycast simulator: C++ BVH renderer over real scene meshes.

The habitat-sim replacement (SURVEY.md C5/2.8) for asset-backed runs:
loads a PLY scene mesh (Replica exports carry vertex colors), builds a BVH
in the C++ core (native/raycaster.cpp), and serves pinhole RGB-D + ERP
RGB-distance frames at poses from the engine. Sensor conventions match the
reference: pinhole z-depth (invalid = 0), ERP radial distance
(miss -> 1e8), RDF camera-to-world poses.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from naruto_tpu.config.schema import MainConfig
from naruto_tpu.sim.base import Simulator
from naruto_tpu.utils.printer import InfoPrinter


def _load_lib():
    from naruto_tpu.native.build import ensure_built

    path = ensure_built("raycaster")
    lib = ctypes.CDLL(path)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.rc_create.restype = ctypes.c_void_p
    lib.rc_create.argtypes = [fp, ctypes.c_int, fp, ip, ctypes.c_int]
    lib.rc_destroy.argtypes = [ctypes.c_void_p]
    lib.rc_render_pinhole.argtypes = [
        ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, fp, fp]
    lib.rc_render_erp.argtypes = [
        ctypes.c_void_p, fp, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        fp, fp]
    return lib


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class RaycastSimulator(Simulator):
    def __init__(self, cfg: MainConfig,
                 printer: Optional[InfoPrinter] = None,
                 verts: Optional[np.ndarray] = None,
                 faces: Optional[np.ndarray] = None,
                 colors: Optional[np.ndarray] = None):
        super().__init__(cfg, printer)
        self._lib = _load_lib()
        if verts is None:
            path = cfg.sim.scene_path
            if path.lower().endswith((".glb", ".gltf")):
                # MP3D / custom NARUTO scenes ship as glb in the reference
                # habitat pipeline (habitat_utils.py:182-215)
                from naruto_tpu.mesh.gltf import load_gltf

                verts, faces, colors = load_gltf(path)
            else:
                from naruto_tpu.mesh.ply import read_ply

                verts, faces, colors_u8 = read_ply(path)
                colors = (colors_u8.astype(np.float32) / 255.0
                          if colors_u8 is not None else None)
        verts = np.ascontiguousarray(verts, dtype=np.float32)
        faces = np.ascontiguousarray(faces, dtype=np.int32)
        col_ptr = None
        if colors is not None:
            colors = np.ascontiguousarray(colors, dtype=np.float32)
            col_ptr = _fp(colors)
        self._handle = self._lib.rc_create(
            _fp(verts), len(verts), col_ptr,
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(faces))
        self._keepalive = (verts, faces, colors)
        self.invalid = cfg.sim.invalid_depth_value

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rc_destroy(self._handle)
            self._handle = None

    def simulate(self, c2w, return_erp: bool = False):
        cfg = self.cfg
        H, W = cfg.sim.pinhole_hw
        c = cfg.cam
        pose = np.ascontiguousarray(np.asarray(c2w, dtype=np.float32)
                                    ).reshape(16)
        color = np.empty((H, W, 3), dtype=np.float32)
        depth = np.empty((H, W), dtype=np.float32)
        self._lib.rc_render_pinhole(
            self._handle, _fp(pose), H, W,
            ctypes.c_float(c.fx), ctypes.c_float(c.fy),
            ctypes.c_float(c.cx), ctypes.c_float(c.cy),
            _fp(color), _fp(depth))
        if not return_erp:
            return color, depth
        He, We = cfg.sim.erp_hw
        erp_color = np.empty((He, We, 3), dtype=np.float32)
        erp_dist = np.empty((He, We), dtype=np.float32)
        self._lib.rc_render_erp(
            self._handle, _fp(pose), He, We, ctypes.c_float(self.invalid),
            _fp(erp_color), _fp(erp_dist))
        return color, depth, erp_color, erp_dist
