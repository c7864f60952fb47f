"""ctypes bindings for the native host-preprocessing library
(native/hostops.cc). Auto-builds with make on first import when the shared
object is missing; every entry point has a numpy fallback in
mhentropy_tpu/data, so the framework degrades gracefully without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostops.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    f = ctypes.c_float
    lib.crop_resize_nearest.argtypes = [f32p, i, i, i, f, f, f, f, f32p, i]
    lib.crop_resize_nearest_u8.argtypes = [u8p, i, i, i, f, f, f, f, f32p, i]
    lib.warp_affine_nearest.argtypes = [f32p, i, i, i, f32p, f, f32p, i]
    lib.warp_affine_nearest_u8.argtypes = [u8p, i, i, i, f32p, f, f32p, i]
    lib.circle_occlude.argtypes = [f32p, i, i, i, i, i, i, f32p, i, u8p]
    lib.depth_mask_visibility.argtypes = [f32p, i, u8p, f32p, i, i, i, f, u8p]
    lib.check_occlusion.argtypes = [f32p, f32p, i, f32p, i, i, f, i, f32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def crop_resize_nearest(img: np.ndarray, centre, half: float, size: int,
                        pad_value: float = 127.0) -> np.ndarray:
    if half <= 0:
        # The C++ kernel's prefix/suffix padding assumes a monotone
        # column map (half > 0); a degenerate crop is all padding.
        # Keep the input dtype (the u8-transport contract: u8 in -> u8
        # out, like the main path's cast-back below) so a degenerate
        # sample cannot promote a collated batch to float.
        c = 1 if img.ndim == 2 else img.shape[2]
        dt = np.uint8 if img.dtype == np.uint8 else np.float32
        out = np.full((size, size, c), pad_value, dt)
        return out[..., 0] if img.ndim == 2 else out
    lib = _load()
    # uint8 sources go straight to the u8 kernel (the convert fuses into
    # the gather — converting the whole source first cost 7x the kernel).
    if img.dtype == np.uint8:
        img = np.ascontiguousarray(img)
        fn = lib.crop_resize_nearest_u8
    else:
        img = np.ascontiguousarray(img, np.float32)
        fn = lib.crop_resize_nearest
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((size, size, c), np.float32)
    fn(
        img, h, w, c, float(centre[0]), float(centre[1]), float(half),
        float(pad_value), out, size,
    )
    out = out[..., 0] if squeeze else out
    # Match the numpy fallback's dtype contract (it preserves the input
    # dtype; a nearest gather copies pixels, so the cast back from the
    # kernel's f32 is exact for integer sources) — same normalisation
    # warp_affine_nearest's caller applies.
    return out if img.dtype != np.uint8 else out.astype(np.uint8)


def warp_affine_nearest(img: np.ndarray, m: np.ndarray, size: int,
                        border: float = 0.0) -> np.ndarray:
    lib = _load()
    if img.dtype == np.uint8:
        img = np.ascontiguousarray(img)
        fn = lib.warp_affine_nearest_u8
    else:
        img = np.ascontiguousarray(img, np.float32)
        fn = lib.warp_affine_nearest
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((size, size, c), np.float32)
    fn(
        img, h, w, c, np.ascontiguousarray(m, np.float32).reshape(6),
        float(border), out, size,
    )
    return out[..., 0] if squeeze else out


def circle_occlude(img: np.ndarray, cx: int, cy: int, r: int,
                   uv: np.ndarray):
    lib = _load()
    # Always copy: the C kernel writes in place, and ascontiguousarray
    # ALIASES a contiguous f32 input — the caller's array was mutated on
    # exactly that path and left untouched on every other dtype/layout.
    img = np.array(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    uv = np.ascontiguousarray(uv, np.float32)
    occ = np.empty(uv.shape[0], np.uint8)
    lib.circle_occlude(img, h, w, c, int(cx), int(cy), int(r), uv,
                       uv.shape[0], occ)
    return (img[..., 0] if squeeze else img), occ.astype(bool)


def depth_mask_visibility(uvd: np.ndarray, mask: np.ndarray,
                          depth_m: np.ndarray, quant: int = 5,
                          tol_mm: float = 40.0) -> np.ndarray:
    lib = _load()
    uvd = np.ascontiguousarray(uvd, np.float32)
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    depth_m = np.ascontiguousarray(depth_m, np.float32)
    h, w = mask.shape
    vis = np.empty(uvd.shape[0], np.uint8)
    lib.depth_mask_visibility(uvd, uvd.shape[0], mask, depth_m, h, w,
                              int(quant), float(tol_mm), vis)
    return vis.astype(bool)


def check_occlusion(uv: np.ndarray, depth: np.ndarray, pose3d: np.ndarray,
                    delta: float = 0.1, quant: int = 1) -> np.ndarray:
    lib = _load()
    uv = np.ascontiguousarray(uv, np.float32)
    z = np.ascontiguousarray(pose3d[:, 2], np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    vis = np.empty(uv.shape[0], np.float32)
    lib.check_occlusion(uv, z, uv.shape[0], depth, h, w, float(delta),
                        int(quant), vis)
    return vis
