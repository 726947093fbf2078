"""ctypes bindings for the fastpack native serializer (fastpack.cpp)."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfastpack.so")
_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            from pace_tpu._native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastpack_write_npy.restype = ctypes.c_int
    lib.fastpack_write_npy.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
    ]
    lib.fastpack_write_many.restype = ctypes.c_int
    lib.fastpack_read_npy_info.restype = ctypes.c_longlong
    lib.fastpack_read_npy_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fastpack_read_npy_data.restype = ctypes.c_longlong
    lib.fastpack_read_npy_data.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
    ]
    _lib = lib
    return lib


def fastpack_available() -> bool:
    return _load() is not None


def write_npy(path: str, array: np.ndarray) -> None:
    """Write one array as .npy via the native backend (numpy fallback)."""
    lib = _load()
    arr = np.ascontiguousarray(array)
    code = _DTYPE_CODES.get(arr.dtype)
    if lib is None or code is None:
        np.save(path if path.endswith(".npy") else path + ".npy", arr)
        return
    shape = (ctypes.c_int64 * arr.ndim)(*arr.shape)
    rc = lib.fastpack_write_npy(
        path.encode(), code, arr.ndim, shape,
        arr.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise IOError(f"fastpack_write_npy failed ({rc}) for {path}")


def write_state_npys(directory: str, state: Dict[str, np.ndarray],
                     n_threads: int = 4) -> None:
    """Write a dict of arrays as <dir>/<name>.npy in parallel native
    threads (GIL released during IO)."""
    lib = _load()
    os.makedirs(directory, exist_ok=True)
    names = list(state)
    arrays = [np.ascontiguousarray(state[n]) for n in names]
    if lib is None or any(
            a.dtype not in _DTYPE_CODES for a in arrays):
        for name, arr in zip(names, arrays):
            np.save(os.path.join(directory, name + ".npy"), arr)
        return
    n = len(names)
    paths = [os.path.join(directory, name + ".npy").encode()
             for name in names]
    c_paths = (ctypes.c_char_p * n)(*paths)
    c_codes = (ctypes.c_int * n)(
        *[_DTYPE_CODES[a.dtype] for a in arrays]
    )
    c_ndims = (ctypes.c_int * n)(*[a.ndim for a in arrays])
    shape_arrs = [(ctypes.c_int64 * a.ndim)(*a.shape) for a in arrays]
    c_shapes = (ctypes.POINTER(ctypes.c_int64) * n)(*shape_arrs)
    c_datas = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays]
    )
    rc = lib.fastpack_write_many(
        n, c_paths, c_codes, c_ndims, c_shapes, c_datas, n_threads
    )
    if rc != 0:
        raise IOError(f"fastpack_write_many failed ({rc})")


def read_npy(path: str) -> np.ndarray:
    """Read a .npy file via the native backend (numpy fallback)."""
    lib = _load()
    if lib is None:
        return np.load(path)
    code = ctypes.c_int()
    ndim = ctypes.c_int()
    shape = (ctypes.c_int64 * 8)()
    nbytes = lib.fastpack_read_npy_info(
        path.encode(), ctypes.byref(code), ctypes.byref(ndim), shape
    )
    if nbytes < 0:
        return np.load(path)
    out = np.empty(
        tuple(shape[i] for i in range(ndim.value)),
        dtype=_CODE_DTYPES[code.value],
    )
    got = lib.fastpack_read_npy_data(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), nbytes
    )
    if got != nbytes:
        raise IOError(f"short read from {path}: {got} != {nbytes}")
    return out
