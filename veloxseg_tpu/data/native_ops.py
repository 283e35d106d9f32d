"""ctypes bindings for native host-transform kernels
(``native/libvsnative.so``).

The loader's per-epoch random tail runs on the host CPU while the chip
trains; its hottest op is the in-plane rotation resample (reference:
MONAI ``RandRotated`` per sampled patch,
``utils/train_autopet.py:132-152``). :func:`rotate_axes01` is an exact
drop-in for ``scipy.ndimage.rotate(v, deg, axes=(0, 1), reshape=False,
order=order, mode="nearest")`` on 3-D float32 volumes (parity-tested in
``tests/test_data.py``), streaming axis-2 rows instead of scipy's
per-voxel spline path. Returns ``None`` when the library isn't built —
callers keep the scipy fallback.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .nifti_fast import _load_lib

_rotate = None


def _load_rotate():
    global _rotate
    if _rotate is not None:
        return _rotate
    lib = _load_lib()
    if lib is None or not hasattr(lib, "vs_rotate_axes01_f32"):
        return None
    fn = lib.vs_rotate_axes01_f32
    fn.argtypes = [ctypes.POINTER(ctypes.c_float)] + \
        [ctypes.c_int64] * 6 + \
        [ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    fn.restype = ctypes.c_int
    _rotate = fn
    return fn


def rotate_axes01(vol: np.ndarray, angle_rad: float, order: int
                  ) -> Optional[np.ndarray]:
    """Rotate a 3-D volume in the (0, 1) plane about its center.

    Semantics match ``scipy.ndimage.rotate(..., axes=(0, 1),
    reshape=False, mode="nearest")`` with spline ``order`` 0 or 1.
    Accepts any float32 strided layout (C or Fortran); other dtypes are
    routed through float32 only when the round trip is exact (order 0 on
    integer data). Returns ``None`` if the native kernel can't take the
    input — caller falls back to scipy.
    """
    fn = _load_rotate()
    if fn is None or vol.ndim != 3 or order not in (0, 1):
        return None
    cast_back = None
    if vol.dtype != np.float32:
        # Bilinear on non-f32 would change numerics; nearest is a pure
        # gather, exact through f32 for ints below 2**24.
        if order != 0 or not np.issubdtype(vol.dtype, np.integer):
            return None
        if vol.dtype.itemsize > 2 and (vol.size == 0 or max(
                abs(int(vol.min())), abs(int(vol.max()))) >= 2 ** 24):
            return None
        cast_back = vol.dtype
        vol = vol.astype(np.float32)
    if 0 in vol.strides:  # broadcast views: let scipy handle it
        return None
    src = np.ascontiguousarray(vol) if not (
        vol.flags.c_contiguous or vol.flags.f_contiguous) else vol
    out = np.empty_like(src)
    es = src.itemsize
    strides = [s // es for s in src.strides]
    rc = fn(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            src.shape[0], src.shape[1], src.shape[2],
            strides[0], strides[1], strides[2],
            float(angle_rad), int(order),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    if cast_back is not None:
        out = out.astype(cast_back)
    return out
