"""Native (C++) tier: build + ctypes bindings.

Two exports (see ``anchor.cpp``):

  - :func:`anchor_gibbs` — the measured single-core baseline sampler
    (BASELINE.md: "the build must first measure the Go reference"; this
    compiled-C++ loop mirrors ``sampler/gibbs-simple.go:163-271`` and is
    the same performance class as the compiled-Go original);
  - :func:`tokenize_f64` — fast whitespace tokenizer used by the UAI
    parser for the numeric tail of large model files (reference
    ``model/reader.go:21-49``).

The shared library is compiled on demand with ``g++ -O2`` into the
package directory and cached by source mtime.  Everything degrades
gracefully: callers must treat :func:`load` returning ``None`` as
"native tier unavailable" and fall back to pure Python/numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "anchor.cpp")
_LIB = os.path.join(_DIR, "_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _build():
            _load_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.anchor_gibbs.restype = ctypes.c_double
        lib.anchor_gibbs.argtypes = [
            ctypes.c_int32, _I32P, _I32P,
            ctypes.c_int32, ctypes.c_int32,
            _I32P, _I32P, _U8P, _I32P, _I32P, _F32P,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32, _I64P,
        ]
        lib.tokenize_f64.restype = ctypes.c_int64
        lib.tokenize_f64.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, _F64P, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def anchor_gibbs(
    model, num_samples: int, seed: int = 1
) -> Optional[Tuple[np.ndarray, float, float]]:
    """Run the native single-core random-scan sampler on ``model``.

    Returns (counts [V, max_card] int64, elapsed_secs, samples_per_sec),
    or None when the native tier is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    from grample_tpu.pgm.encode import encode_model

    enc = encode_model(model)
    la = enc.legacy_arrays()
    v = model.num_vars
    kdim = enc.caps.max_card
    counts = np.zeros((v + 1, kdim), dtype=np.int64)
    elapsed = lib.anchor_gibbs(
        np.int32(v),
        np.ascontiguousarray(la["cards"], np.int32),
        np.ascontiguousarray(la["fixed"], np.int32),
        np.int32(la["adj_offset"].shape[1]),
        np.int32(la["adj_scope_vars"].shape[2]),
        np.ascontiguousarray(la["adj_offset"], np.int32),
        np.ascontiguousarray(la["adj_self_stride"], np.int32),
        np.ascontiguousarray(la["adj_mask"], np.uint8),
        np.ascontiguousarray(la["adj_scope_vars"], np.int32),
        np.ascontiguousarray(la["adj_scope_strides"], np.int32),
        np.ascontiguousarray(la["tables"], np.float32),
        np.int64(num_samples),
        np.uint64(seed),
        np.int32(kdim),
        counts,
    )
    rate = num_samples / max(elapsed, 1e-12)
    return counts[:v], float(elapsed), float(rate)


def tokenize_f64(data: bytes, expect: int) -> Optional[np.ndarray]:
    """Parse up to ``expect`` whitespace-separated floats from ``data``.

    Returns the parsed array (length = actual token count <= expect), or
    None when the native tier is unavailable or the buffer is malformed.
    """
    lib = load()
    if lib is None:
        return None
    out = np.empty(expect, dtype=np.float64)
    n = lib.tokenize_f64(data, np.int64(len(data)), out, np.int64(expect))
    if n < 0:
        return None
    return out[:n]
