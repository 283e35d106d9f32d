"""ctypes binding for the native NIfTI loader (``native/libvsnative.so``).

Falls back to the pure-Python reader transparently when the library isn't
built. ``load_nifti_fast`` mirrors :func:`veloxseg_tpu.data.nifti.load_nifti`
(data as float32, Fortran-order shape, spacing).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from .nifti import NiftiImage, load_nifti

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libvsnative.so")
_lib: Optional[ctypes.CDLL] = None


class _Header(ctypes.Structure):
    _fields_ = [
        ("ndim", ctypes.c_int32),
        ("shape", ctypes.c_int32 * 7),
        ("spacing", ctypes.c_float * 7),
        ("datatype", ctypes.c_int32),
        ("voxels", ctypes.c_int64),
    ]


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.vs_nifti_read_header.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(_Header)]
    lib.vs_nifti_read_header.restype = ctypes.c_int
    lib.vs_nifti_read_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.vs_nifti_read_f32.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_nifti_fast(path: str) -> NiftiImage:
    lib = _load_lib()
    if lib is None:
        return load_nifti(path)
    hdr = _Header()
    rc = lib.vs_nifti_read_header(path.encode(), ctypes.byref(hdr))
    if rc != 0:
        return load_nifti(path)
    shape = tuple(int(hdr.shape[i]) for i in range(hdr.ndim))
    out = np.empty(int(hdr.voxels), dtype=np.float32)
    rc = lib.vs_nifti_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if rc != 0:
        return load_nifti(path)
    data = out.reshape(shape, order="F")
    spacing = tuple(abs(float(hdr.spacing[i]))
                    for i in range(min(hdr.ndim, 3)))
    affine = np.diag(list(spacing[:3]) + [1.0])
    return NiftiImage(data=data, spacing=spacing, affine=affine)
