"""ctypes bindings to the native C++ runtime (``runtime/libmmreg_runtime.so``).

Provides the fast NIfTI decode path and the threaded prefetch pool used by the
batch pipeline. Falls back to the pure-Python :mod:`utils.nifti` reader when
the shared library hasn't been built (build with
``make -C multimodal_registration_tpu/runtime``; it is also auto-built on
first use if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libmmreg_runtime.so")

_lib = None
_lib_lock = threading.Lock()


def _build_lib() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _RUNTIME_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_lib():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mmreg_load_nifti.restype = ctypes.c_int
        lib.mmreg_load_nifti.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mmreg_nifti_dims.restype = ctypes.c_int
        lib.mmreg_nifti_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
        lib.mmreg_prefetch_create.restype = ctypes.c_void_p
        lib.mmreg_prefetch_create.argtypes = [ctypes.c_int]
        lib.mmreg_prefetch_submit.restype = ctypes.c_int64
        lib.mmreg_prefetch_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mmreg_prefetch_wait.restype = ctypes.c_int
        lib.mmreg_prefetch_wait.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mmreg_prefetch_destroy.restype = None
        lib.mmreg_prefetch_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "mmreg_write_file_gz"):
            lib.mmreg_write_file_gz.restype = ctypes.c_int
            lib.mmreg_write_file_gz.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int,
            ]
        _lib = lib
        return _lib


def _alloc_for(path: str, lib):
    dims = (ctypes.c_int32 * 8)()
    nd = lib.mmreg_nifti_dims(path.encode(), dims)
    if nd < 1:
        raise IOError(f"native nifti dims failed ({nd}) for {path}")
    shape = tuple(int(dims[i + 1]) for i in range(nd))
    n = int(np.prod(shape))
    out = np.empty(n, np.float32)
    return out, shape, n


def _finish(out, shape, affine_buf):
    # NIfTI data is Fortran-ordered on disk
    data = out.reshape(shape, order="F")
    affine = np.frombuffer(affine_buf, np.float32).reshape(4, 4).astype(np.float64)
    return np.ascontiguousarray(data), affine


def load_nifti_native(path: str):
    """(data_float32, affine) via the native loader; raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native runtime not available")
    out, shape, n = _alloc_for(path, lib)
    dims = (ctypes.c_int32 * 8)()
    aff = (ctypes.c_float * 16)()
    rc = lib.mmreg_load_nifti(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, dims, aff
    )
    if rc < 0:
        raise IOError(f"native nifti load failed ({rc}) for {path}")
    return _finish(out, shape, aff)


def write_gz_native(path: str, payload: bytes, level: int | None = None) -> bool:
    """Deflate `payload` to `path` via the C++ writer; False when unavailable.

    ~4-6x faster than Python gzip level 9 on 192^3 volumes — the .nii.gz
    save path of the batch pipeline (moved/field/seg/detJa per subject).
    Default level 1 = nibabel's ImageOpener default (the reference's write
    path); float volumes gain little from higher levels."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mmreg_write_file_gz"):
        return False
    if level is None:
        level = int(os.environ.get("MMREG_GZ_LEVEL", 1))
    rc = lib.mmreg_write_file_gz(path.encode(), payload, len(payload), level)
    if rc != 0:
        raise IOError(f"native gzip write failed ({rc}) for {path}")
    return True


class PrefetchPool:
    """Threaded NIfTI prefetcher backed by the C++ pool."""

    def __init__(self, n_threads: int = 4):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native runtime not available")
        self._pool = self._lib.mmreg_prefetch_create(n_threads)
        self._paths = {}

    def submit(self, path: str) -> int:
        t = self._lib.mmreg_prefetch_submit(self._pool, path.encode())
        self._paths[t] = path
        return t

    def wait(self, ticket: int):
        path = self._paths.pop(ticket)
        out, shape, n = _alloc_for(path, self._lib)
        dims = (ctypes.c_int32 * 8)()
        aff = (ctypes.c_float * 16)()
        rc = self._lib.mmreg_prefetch_wait(
            self._pool, ticket, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, dims, aff,
        )
        if rc < 0:
            raise IOError(f"native prefetch failed ({rc}) for {path}")
        return _finish(out, shape, aff)

    def close(self):
        if self._pool:
            self._lib.mmreg_prefetch_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
