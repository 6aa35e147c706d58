"""ctypes loader for the native golden NTT (csrc/golden_ntt.c).

Compiles the shared library on first use (cc -O2 -shared -fPIC) into
csrc/build/; falls back to None if no C toolchain is available, in which
case golden/ntt.py keeps its pure-numpy path. Outputs are bit-identical
either way (exact integer arithmetic).
"""

from __future__ import annotations

import ctypes
import pathlib
import shutil
import subprocess

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "build" / "golden_ntt.so"
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        src = _CSRC / "golden_ntt.c"
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
            cc = shutil.which("cc") or shutil.which("gcc")
            if cc is None:
                return None
            _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        for name in ("ntt_fwd_u64", "ntt_inv_u64"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_uint64,
                ctypes.c_uint64,
            ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def ntt_u64(x, q: int, psi: int, inverse: bool):
    """Batched transform of uint64[batch, n] (in place on a copy); returns the
    transformed array or None when the native library is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None or q >= (1 << 62):
        return None
    arr = np.ascontiguousarray(np.asarray(x, dtype=np.uint64))
    shape = arr.shape
    n = shape[-1]
    flat = arr.reshape(-1, n).copy()
    fn = lib.ntt_inv_u64 if inverse else lib.ntt_fwd_u64
    fn(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        flat.shape[0], n, q, psi,
    )
    return flat.reshape(shape)
