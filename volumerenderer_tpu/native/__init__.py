"""ctypes bindings for the native codec kernels (see ``kdtree_native.cpp``).

The library is built on demand with ``make`` (g++); if unavailable, callers
fall back to the pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libkdtree_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain — caller falls back to Python
            raise OSError(f"native build failed: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.seed_level_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    lib.seed_level_f64.restype = None
    lib.encode_level_i32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    lib.encode_level_i32.restype = ctypes.c_int64
    lib.decode_preorder_native.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.decode_preorder_native.restype = None
    lib.build_full_native.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.build_full_native.restype = ctypes.c_int64
    lib.set_native_threads.argtypes = [ctypes.c_int32]
    lib.set_native_threads.restype = None
    lib.preorder_to_levels_native.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32]
    lib.preorder_to_levels_native.restype = None
    lib.hashed_build_native.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.hashed_build_native.restype = ctypes.c_int64
    _lib = lib
    return lib


class kdtree_native:
    """Namespace matching the import in ``codecs.kdtree``."""

    @staticmethod
    def set_threads(n: int):
        """Cap the native build's fork-join parallelism (default: all cores;
        results are bit-identical at any thread count — the level sweeps
        reduce exact int64 partial sums and the tree forks are disjoint)."""
        _load().set_native_threads(int(n))

    @staticmethod
    def seed_level(truth: np.ndarray, parent: np.ndarray):
        lib = _load()
        truth = np.ascontiguousarray(truth, dtype=np.float64)
        parent = np.ascontiguousarray(parent, dtype=np.float64)
        out = np.zeros(2, dtype=np.float64)
        lib.seed_level_f64(
            truth.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            parent.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            truth.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return float(out[0]), float(out[1])

    @staticmethod
    def decode_preorder(preorder: np.ndarray, distance_map: np.ndarray,
                        X: int, Y: int, Z: int, orig_depth: int,
                        max_depth: int, cut_depth: int) -> np.ndarray:
        from ..utils.bitarray import pack2_np

        lib = _load()
        packed = np.ascontiguousarray(pack2_np(preorder))
        dm = np.ascontiguousarray(distance_map, dtype=np.uint8)
        out = np.zeros(X * Y * Z, dtype=np.uint8)
        lib.decode_preorder_native(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(preorder),
            dm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            X, Y, Z, orig_depth, max_depth, cut_depth,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape(Z, Y, X)

    @staticmethod
    def encode_level(truth: np.ndarray, parent: np.ndarray, distance: int):
        lib = _load()
        truth = np.ascontiguousarray(truth, dtype=np.uint8)
        parent = np.ascontiguousarray(parent, dtype=np.int32)
        n = truth.shape[0]
        codes = np.empty(n, dtype=np.uint8)
        recon = np.empty(n, dtype=np.int32)
        sum_sq = lib.encode_level_i32(
            truth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, int(distance),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            recon.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return codes, recon, int(sum_sq)

    @staticmethod
    def build_full(volume, tolerance: int, max_epochs: int,
                   orig_depth: int, max_depth: int, distance_map):
        """Full sequential build (arbitrary dims).  ``distance_map`` must be
        pre-filled with the extra-level ladder; returns (num_active,
        packed_preorder, leaf_recon)."""
        lib = _load()
        Z, Y, X = volume.shape
        vol = np.ascontiguousarray(volume, dtype=np.uint8)
        dm = np.ascontiguousarray(distance_map, dtype=np.uint8)
        num_max = ((1 << (orig_depth + 1)) - 1) + (1 << orig_depth) * (max_depth - orig_depth)
        packed = np.zeros((num_max + 3) // 4, dtype=np.uint8)
        leaf_recon = np.zeros(1 << orig_depth, dtype=np.int32)
        n_active = lib.build_full_native(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            X, Y, Z, tolerance, max_epochs, orig_depth, max_depth,
            dm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            leaf_recon.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return int(n_active), packed, dm, leaf_recon

    @staticmethod
    def preorder_to_levels(packed: np.ndarray, num_active: int,
                           orig_depth: int, max_depth: int, chain_len: int):
        """Rebuild the level-structured layout from a packed 2-bit preorder
        stream; returns (levels_flat prefilled 3, chains prefilled 255)."""
        lib = _load()
        packed = np.ascontiguousarray(packed, dtype=np.uint8)
        levels_flat = np.full((1 << (orig_depth + 1)) - 1, 3, dtype=np.uint8)
        chains = np.full(((1 << orig_depth), chain_len), 255, dtype=np.uint8)
        lib.preorder_to_levels_native(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(num_active), int(orig_depth), int(max_depth),
            levels_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            chains.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(chain_len))
        return levels_flat, chains


class hashed_native:
    """Native Morton-hashed builder (see ``hashed_native.cpp``)."""

    MAX_ADD_LEVELS = 4

    @staticmethod
    def build(mid_flat: np.ndarray, uniform_flat: np.ndarray, D: int,
              tolerance: int):
        """Returns (tree_data, tree_structure, key_by_idx, coll_data,
        coll_structure, n_coll, distance_map, tree_depth)."""
        lib = _load()
        n = 1 << D
        mid_flat = np.ascontiguousarray(mid_flat, dtype=np.uint8)
        uniform_flat = np.ascontiguousarray(uniform_flat, dtype=np.uint8)
        ncoll = 2 * (2 * n + hashed_native.MAX_ADD_LEVELS * n) + 8
        tree_data = np.zeros(n, dtype=np.uint8)
        tree_structure = np.zeros(n, dtype=np.uint8)
        coll_data = np.zeros(ncoll, dtype=np.uint8)
        coll_structure = np.zeros(ncoll, dtype=np.uint8)
        key_by_idx = np.zeros(ncoll, dtype=np.int64)
        dm = np.zeros(64, dtype=np.uint8)
        tree_depth = np.zeros(1, dtype=np.int32)
        n_coll = lib.hashed_build_native(
            mid_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            uniform_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(D), int(tolerance),
            tree_data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tree_structure.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            coll_data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            coll_structure.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            key_by_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tree_depth.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return (tree_data, tree_structure, key_by_idx, coll_data,
                coll_structure, int(n_coll), dm, int(tree_depth[0]))
