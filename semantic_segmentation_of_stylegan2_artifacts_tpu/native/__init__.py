"""Native (C++) host-pipeline components: GIL-released image decode.

``decode.cpp`` is compiled on first use with the toolchain baked into the
image (g++, libpng, libjpeg) into ``_build/libssadecode.so`` and loaded
via ctypes — ctypes foreign calls drop the GIL, so the threaded loader's
workers (``data/pipeline.py``) decompress PNG/JPEG truly in parallel,
where PIL's decoder holds the GIL through much of its Python-side
plumbing.  The reference's analogous native path is torch DataLoader
worker processes (reference ``trainer.py:193-245``).

Degrades gracefully: if the build or load fails (no compiler, missing
libs), ``available()`` is False and callers fall back to PIL.  Set
``SSA_TPU_NATIVE_DECODE=0`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cpp")
_BUILD_DIR = os.path.join(_DIR, "_build")
_SO = os.path.join(_BUILD_DIR, "libssadecode.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str:
    """Compile decode.cpp -> _build/libssadecode.so (cached by mtime)."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    tmp = _SO + f".tmp{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lpng", "-ljpeg",
         "-o", tmp],
        check=True, capture_output=True,
    )
    os.replace(tmp, _SO)  # atomic: concurrent builders race benignly
    return _SO


def _get():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            if os.environ.get("SSA_TPU_NATIVE_DECODE", "1") == "0":
                return None
            try:
                lib = ctypes.CDLL(_build())
                lib.ssa_image_probe.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.ssa_image_probe.restype = ctypes.c_int
                lib.ssa_decode.argtypes = [
                    ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ]
                lib.ssa_decode.restype = ctypes.c_int
                _lib = lib
            except Exception:
                _lib = None
    return _lib


def available() -> bool:
    return _get() is not None


def decode_image(
    path: Optional[str] = None,
    data: Optional[bytes] = None,
    gray: bool = False,
) -> np.ndarray:
    """Decode a PNG/JPEG file (or buffer) to uint8 (H, W, 3) or (H, W).

    RGB matches ``PIL.Image.open(p).convert("RGB")`` byte-for-byte for
    PNGs; luma uses PIL's exact ITU-R 601-2 fixed-point rounding.
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native decode library unavailable")
    if data is None:
        with open(path, "rb") as fh:
            data = fh.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    kind = lib.ssa_image_probe(data, len(data), ctypes.byref(w),
                               ctypes.byref(h))
    if kind == 0:
        raise ValueError(f"unsupported or corrupt image: {path!r}")
    channels = 1 if gray else 3
    shape = (h.value, w.value) if gray else (h.value, w.value, 3)
    out = np.empty(shape, np.uint8)
    rc = lib.ssa_decode(data, len(data),
                        out.ctypes.data_as(ctypes.c_void_p),
                        w.value, h.value, channels)
    if rc != 0:
        raise ValueError(f"decode failed (rc={rc}): {path!r}")
    return out
