"""ctypes bindings for the native C++ image pipeline (native/image_pipeline.cc).

``decode_batch(jpeg_bytes_list, out_size, train, seed)`` decodes and transforms a
whole batch in C++ threads (libjpeg + Pillow-style triangle-filter resize + crop/flip
+ ImageNet normalize), returning an NHWC float32 batch. Falls back cleanly: callers
check ``is_available()`` and use the PIL path otherwise.

Builds on demand with ``make -C native`` (g++ + libjpeg are part of this image).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvit_tpu_data.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.vit_tpu_decode_batch.restype = ctypes.c_int
    lib.vit_tpu_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),          # jpegs
        ctypes.POINTER(ctypes.c_size_t),          # sizes
        ctypes.c_int,                             # n
        ctypes.c_int,                             # out_size
        ctypes.c_int,                             # train
        ctypes.c_uint64,                          # seed
        ctypes.POINTER(ctypes.c_float),           # out
        ctypes.c_int,                             # num_threads
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def decode_batch(jpegs: List[bytes], out_size: int, *, train: bool = True,
                 seed: int = 0, num_threads: int = 8) -> np.ndarray:
    """Decode+transform a list of JPEG byte strings → (N, S, S, 3) float32 NHWC."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image pipeline not available (build failed?)")
    n = len(jpegs)
    bufs = (ctypes.c_char_p * n)(*jpegs)
    sizes = (ctypes.c_size_t * n)(*[len(j) for j in jpegs])
    out = np.empty((n, out_size, out_size, 3), np.float32)
    failures = lib.vit_tpu_decode_batch(
        bufs, sizes, n, out_size, int(train), seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if failures:
        raise IOError(f"{failures}/{n} JPEG decodes failed")
    return out
