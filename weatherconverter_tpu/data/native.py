"""ctypes binding for the native decode library (native/wcdecode.cpp).

Auto-builds with `make -C native` if the .so is missing and a toolchain is
available; falls back to PIL transparently otherwise. The native path
decodes+resizes a whole batch in parallel C++ threads with zero Python
object churn — the host-side throughput uplift that keeps a TPU fed (the
reference decodes synchronously in Python, dataloader.py:39-48, workers=0).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _src_hash(src: str) -> str:
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("WCTPU_NO_NATIVE") == "1":
        return None
    so = os.path.join(_repo_root(), "native", "libwcdecode.so")
    src = os.path.join(_repo_root(), "native", "wcdecode.cpp")
    stamp = so + ".srchash"
    # Staleness is content-based, not mtime-based: git does not preserve
    # mtimes, so a fresh checkout routinely leaves the source "newer" than
    # the tracked .so and an mtime check would make -B on first import
    # (~2 min latency, dirties the checked-in binary — ADVICE r4). Rebuild
    # when the .so is missing, when the stored source hash mismatches, or on
    # explicit opt-in (WCTPU_NATIVE_REBUILD=1). A stale binary without a
    # stamp is still caught loudly-but-safely by the ABI version check.
    stale = not os.path.exists(so)
    if not stale and os.environ.get("WCTPU_NATIVE_REBUILD") == "1":
        stale = True
    elif not stale and os.path.exists(stamp) and os.path.exists(src):
        with open(stamp) as f:
            stale = f.read().strip() != _src_hash(src)
    if stale:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(so), "-B"],
                check=True, capture_output=True, timeout=120,
            )
            if os.path.exists(src):
                with open(stamp, "w") as f:
                    f.write(_src_hash(src) + "\n")
        except Exception:
            if not os.path.exists(so):
                return None  # no .so at all; else fall through to the
                # version check, which rejects a stale ABI loudly-but-safely
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    try:
        _bind_symbols(lib)
    except AttributeError:
        # stale .so from a build predating some symbols (auto-build only
        # runs when the file is MISSING): honor the graceful-fallback
        # contract instead of raising out of the loader
        return None
    _LIB = lib
    return lib


_ABI_VERSION = 2  # bump in lockstep with wc_abi_version() in wcdecode.cpp


def _bind_symbols(lib: ctypes.CDLL) -> None:
    lib.wc_abi_version.restype = ctypes.c_int
    lib.wc_abi_version.argtypes = []
    if lib.wc_abi_version() != _ABI_VERSION:
        raise AttributeError("stale libwcdecode.so ABI")
    lib.wc_decode_box.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.wc_decode_box.restype = ctypes.c_int
    lib.wc_decode_exact.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.wc_decode_exact.restype = ctypes.c_int
    for fn in (lib.wc_decode_box_batch, lib.wc_decode_exact_batch):
        fn.restype = ctypes.c_int
    lib.wc_decode_box_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.wc_decode_exact_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_box(
    path: str, smaller_side: int, out_hw: tuple[int, int], fast: bool = False
) -> Optional[np.ndarray]:
    """fast=True permits JPEG DCT-domain pre-scaling (PIL draft() semantics):
    decode at the smallest M/8 scale whose min side still covers
    `smaller_side`, then triangle-resize down. A few LSBs off the full-decode
    path on JPEG sources; PNG is bit-identical either way."""
    lib = _load()
    if lib is None:
        return None
    th, tw = out_hw
    out = np.empty((th, tw, 3), dtype=np.uint8)
    rc = lib.wc_decode_box(
        path.encode(), smaller_side, th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(fast),
    )
    return out if rc == 0 else None


def decode_exact(
    path: str, out_hw: tuple[int, int], fast: bool = False
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    th, tw = out_hw
    out = np.empty((th, tw, 3), dtype=np.uint8)
    rc = lib.wc_decode_exact(
        path.encode(), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(fast),
    )
    return out if rc == 0 else None


def decode_box_batch(
    paths: Sequence[str], smaller_side: int, out_hw: tuple[int, int],
    nthreads: int = 0, fast: bool = False,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    th, tw = out_hw
    out = np.empty((len(paths), th, tw, 3), dtype=np.uint8)
    fails = lib.wc_decode_box_batch(
        _paths_array(paths), len(paths), smaller_side, th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads, int(fast),
    )
    return out if fails == 0 else None


def decode_exact_batch(
    paths: Sequence[str], out_hw: tuple[int, int], nthreads: int = 0,
    fast: bool = False,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    th, tw = out_hw
    out = np.empty((len(paths), th, tw, 3), dtype=np.uint8)
    fails = lib.wc_decode_exact_batch(
        _paths_array(paths), len(paths), th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads, int(fast),
    )
    return out if fails == 0 else None
