"""ctypes binding for the native C++ JPEG pipeline (jpeg_loader.cpp).

The reference's host input path is pure Python-in-worker-processes
(reference: src/main.py:139-153, data_loader.py:85-121); this framework's
hot host path is a single C++ shared object — libjpeg decode with
DCT-domain scaling, PIL-semantics antialiased resize, and an in-process
std::thread batch pool (GIL released for the whole batch, no fork/pickle).

The library is compiled on first use with the system toolchain and cached
next to the source, keyed by a source hash (no build step, no pybind11).
When g++ or libjpeg is unavailable, `available()` returns False and all
callers (data/coco.py) silently keep the PIL path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_loader.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("ICT_NATIVE_CACHE",
                           os.path.join(_DIR, "_build"))
    so = os.path.join(cache, f"libicl_{tag}.so")
    if not os.path.exists(so):
        os.makedirs(cache, exist_ok=True)
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", tmp, "-ljpeg", "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp, so)
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.icl_version.restype = ctypes.c_int
    lib.icl_probe.argtypes = [u8p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.icl_probe.restype = ctypes.c_int
    lib.icl_eval_batch.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.icl_train_batch.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.icl_square_batch.argtypes = [
        ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build()
                _tried = True
    return _lib


def available() -> bool:
    return _get() is not None


def _ptrs(bufs: Sequence[bytes]):
    n = len(bufs)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    arr = (u8p * n)()
    lens = (ctypes.c_size_t * n)()
    for i, b in enumerate(bufs):
        arr[i] = ctypes.cast(ctypes.c_char_p(b), u8p)
        lens[i] = len(b)
    return arr, lens


def _out_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def default_threads() -> int:
    return int(os.environ.get("ICT_NATIVE_THREADS", os.cpu_count() or 1))


def probe(buf: bytes) -> Optional[Tuple[int, int]]:
    """JPEG header decode: (width, height), or None if not a valid JPEG."""
    lib = _get()
    assert lib is not None, "native loader unavailable"
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rc = lib.icl_probe(ctypes.cast(ctypes.c_char_p(buf), u8p), len(buf),
                       ctypes.byref(w), ctypes.byref(h))
    return (w.value, h.value) if rc == 0 else None


def decode_eval_batch(bufs: Sequence[bytes], size: int, *,
                      draft: "bool | int" = True,
                      n_threads: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Eval transform for a batch of JPEG byte strings.

    Returns (images [n, size, size, 3] uint8, status [n] int32 — 0 = ok).
    `draft=True` decodes at reduced DCT scale with the decoded shorter side
    kept >= `size` (the DCT scaling is itself a proper resampling filter);
    an int sets the decode target explicitly; `draft=False` is the
    PIL-parity full-decode mode.
    """
    lib = _get()
    assert lib is not None, "native loader unavailable"
    n = len(bufs)
    # isinstance, not `is True`: np.bool_(True) would otherwise fall into
    # int(draft) == 1 and silently decode at a 1-pixel DCT target
    if isinstance(draft, (bool, np.bool_)):
        draft_target = size if draft else 0
    else:
        draft_target = int(draft)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    arr, lens = _ptrs(bufs)
    lib.icl_eval_batch(arr, lens, n, size, draft_target, _out_ptr(out),
                       status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                       n_threads or default_threads())
    return out, status


def decode_train_batch(bufs: Sequence[bytes], boxes: np.ndarray,
                       flips: np.ndarray, size: int, *,
                       n_threads: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Train transform: per-item crop box [n, 4] (x, y, w, h) + flip [n],
    resized to (size, size). The boxes come from the same seeded-RNG draw
    as the PIL path (data/coco.py random_resized_crop), so sample sequences
    are bit-identical in distribution terms."""
    lib = _get()
    assert lib is not None, "native loader unavailable"
    n = len(bufs)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    boxes = np.ascontiguousarray(boxes, dtype=np.int32)
    flips = np.ascontiguousarray(flips, dtype=np.int32)
    arr, lens = _ptrs(bufs)
    lib.icl_train_batch(arr, lens, n,
                        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                        size, _out_ptr(out),
                        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                        n_threads or default_threads())
    return out, status


def decode_square_batch(bufs: Sequence[bytes], target: int, canvas: int, *,
                        n_threads: Optional[int] = None
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """device_resize host path: DCT-scaled decode-only onto a fixed canvas
    (mirrors data/coco.load_image_square). Returns (canvases
    [n, canvas, canvas, 3] uint8, sides [n] int32 — negative = error)."""
    lib = _get()
    assert lib is not None, "native loader unavailable"
    n = len(bufs)
    out = np.empty((n, canvas, canvas, 3), dtype=np.uint8)
    sides = np.zeros(n, dtype=np.int32)
    arr, lens = _ptrs(bufs)
    lib.icl_square_batch(arr, lens, n, target, canvas, _out_ptr(out),
                         sides.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                         n_threads or default_threads())
    return out, sides
