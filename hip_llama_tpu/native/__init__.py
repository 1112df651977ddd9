"""ctypes bindings for the native host runtime (csrc/hipllama_host.cpp).

Builds the shared library on first use (g++ -O2 -shared) and caches it next
to the source; every entry point has a pure-Python fallback (tokenizer.py /
sampler.py), so the framework works without a toolchain — the native path
is a host-CPU fast path for encode (the O(n^2) greedy merge) and sampling.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_HERE, "..", "..", "csrc", "hipllama_host.cpp")
_SO = os.path.join(_HERE, "hipllama_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_CSRC)
    if not os.path.exists(src):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", src, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.tok_load.restype = ctypes.c_void_p
        lib.tok_load.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.tok_from_buffers.restype = ctypes.c_void_p
        lib.tok_from_buffers.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.tok_free.argtypes = [ctypes.c_void_p]
        lib.tok_encode.restype = ctypes.c_int
        lib.tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.tok_decode_piece.restype = ctypes.c_int
        lib.tok_decode_piece.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.sample_token.restype = ctypes.c_int
        lib.sample_token.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint64),
        ]
        _lib = lib
        return _lib


class NativeTokenizer:
    """Drop-in fast path for tokenizer.Tokenizer encode/decode_piece."""

    def __init__(self, vocab: list[bytes], scores: list[float]):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        blob = b"".join(vocab)
        lens = (ctypes.c_int32 * len(vocab))(*[len(v) for v in vocab])
        sc = (ctypes.c_float * len(scores))(*scores)
        self._h = lib.tok_from_buffers(blob, lens, sc, len(vocab))
        if not self._h:
            raise RuntimeError("tok_from_buffers failed")
        self._maxlen = max((len(v) for v in vocab), default=1)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tok_free(self._h)
        except Exception:
            pass

    def encode(self, text: str | bytes, bos: bool, eos: bool) -> list[int]:
        raw = text.encode("utf-8") if isinstance(text, str) else bytes(text)
        cap = 2 * len(raw) + 8
        out = (ctypes.c_int * cap)()
        n = self._lib.tok_encode(
            self._h, raw, len(raw), int(bos), int(eos), out, cap
        )
        return list(out[: min(n, cap)])

    def decode_piece(self, prev: int, token: int) -> bytes:
        buf = (ctypes.c_uint8 * (self._maxlen + 8))()
        n = self._lib.tok_decode_piece(self._h, prev, token, buf, len(buf))
        return bytes(buf[:n])


class NativeSampler:
    """Drop-in fast path for sampler.Sampler (same xorshift64* stream)."""

    def __init__(self, vocab_size: int, temperature: float = 1.0,
                 topp: float = 0.9, seed: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.vocab_size = vocab_size
        self.temperature = float(temperature)
        self.topp = float(topp)
        self._state = ctypes.c_uint64(seed & (2**64 - 1))

    def sample(self, logits) -> int:
        import numpy as np

        arr = np.ascontiguousarray(np.asarray(logits, np.float32))
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return int(
            self._lib.sample_token(
                ptr, arr.size, self.temperature, self.topp,
                ctypes.byref(self._state),
            )
        )
