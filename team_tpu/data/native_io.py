"""ctypes bindings for the native data-loading runtime (``native/team_io.cc``).

The native library provides:
* ``load_batch``: threaded JPEG/PNG decode + bicubic resize + CLIP normalize
  for a batch of file paths -> float32 NHWC (replaces the reference's
  DataLoader worker processes + PIL transform chain);
* ``herding``: C++ herding exemplar selection (reference ``models/base.py:291``
  math) for large per-class sample counts.

Auto-builds the shared library on first use if the toolchain is present;
callers must fall back to the Python paths when :func:`available` is False.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libteam_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # run make unconditionally (mtime-incremental): a stale .so built before a
    # symbol was added would otherwise raise AttributeError at binding time
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:  # toolchain missing -> python fallback
        logging.info("native team_io build unavailable: %s", e)
        if not os.path.isfile(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.team_io_load_batch.restype = ctypes.c_int
        lib.team_io_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.team_io_load_batch_u8.restype = ctypes.c_int
        lib.team_io_load_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.team_io_load_batch_u8_patches.restype = ctypes.c_int
        lib.team_io_load_batch_u8_patches.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.team_io_herding.restype = None
        lib.team_io_herding.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except (OSError, AttributeError) as e:
        # AttributeError: stale library missing a newer symbol — degrade to
        # the PIL/numpy fallbacks rather than killing the run
        logging.info("native team_io load failed: %s", e)
    return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: Sequence[str], image_size: int = 224,
               hflip: Optional[np.ndarray] = None, n_threads: int = 8
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+preprocess ``paths`` -> (``[B, S, S, 3] f32``, ok mask ``[B] bool``)."""
    lib = _load()
    assert lib is not None, "native team_io not available"
    b = len(paths)
    out = np.empty((b, image_size, image_size, 3), dtype=np.float32)
    ok = np.zeros(b, dtype=np.uint8)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    flips = np.zeros(b, dtype=np.uint8) if hflip is None else hflip.astype(np.uint8)
    lib.team_io_load_batch(
        arr, b, image_size,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def load_batch_u8(paths: Sequence[str], image_size: int = 224,
                  hflip: Optional[np.ndarray] = None, n_threads: int = 8
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize only -> (``[B, S, S, 3] uint8``, ok mask). Normalization
    runs fused on device (:mod:`team_tpu.ops.preprocess`); the uint8 batch is
    4x smaller on the host->device link than the float32 variant."""
    lib = _load()
    assert lib is not None, "native team_io not available"
    b = len(paths)
    out = np.empty((b, image_size, image_size, 3), dtype=np.uint8)
    ok = np.zeros(b, dtype=np.uint8)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    flips = np.zeros(b, dtype=np.uint8) if hflip is None else hflip.astype(np.uint8)
    lib.team_io_load_batch_u8(
        arr, b, image_size,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def load_batch_u8_patches(paths: Sequence[str], image_size: int = 224,
                          patch_size: int = 16,
                          hflip: Optional[np.ndarray] = None,
                          n_threads: int = 8
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize into the ViT patch-pixel layout ->
    (``[B, grid², 3·ps²] uint8``, ok mask). Same bytes as ``load_batch_u8``
    but the device does ZERO spatial reorder — the [H, W, 3] minor-dim-3
    layout is lane-hostile on TPU; patch-major measured +83 img/s on the
    int8 encode (scripts/r4_patch_ingest_probe.py). Element order matches
    :func:`team_tpu.backbone.clip.patch_pixels` exactly (tested)."""
    lib = _load()
    assert lib is not None, "native team_io not available"
    b = len(paths)
    grid = image_size // patch_size
    out = np.empty((b, grid * grid, 3 * patch_size * patch_size),
                   dtype=np.uint8)
    ok = np.zeros(b, dtype=np.uint8)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    flips = np.zeros(b, dtype=np.uint8) if hflip is None else hflip.astype(np.uint8)
    lib.team_io_load_batch_u8_patches(
        arr, b, image_size, patch_size,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, ok.astype(bool)


def herding(vectors: np.ndarray, class_mean: np.ndarray, m: int) -> np.ndarray:
    """Native herding selection; same result as the numpy implementation."""
    lib = _load()
    assert lib is not None, "native team_io not available"
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    class_mean = np.ascontiguousarray(class_mean, dtype=np.float32)
    n, d = vectors.shape
    m = min(m, n)
    out = np.zeros(m, dtype=np.int32)
    lib.team_io_herding(
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        class_mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out.astype(np.int64)
