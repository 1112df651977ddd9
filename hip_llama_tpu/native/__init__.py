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
        lib.sched_create.restype = ctypes.c_void_p
        lib.sched_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.sched_free.argtypes = [ctypes.c_void_p]
        lib.sched_bind.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64,
        ]
        lib.sched_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.sched_advance.restype = ctypes.c_int
        lib.sched_advance.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
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


class NativeScheduler:
    """Native continuous-batching slot state machine (csrc sched_*): the
    C++ scheduler half of the reference's test_data_parallelism loop. The
    engine calls advance() once per decode step with the step's logits (or
    on-device-sampled tokens); prompt force-feed, reference-RNG sampling and
    BOS/EOS/length retirement all happen in native code."""

    def __init__(self, n_slots: int, vocab_size: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.sched_create(n_slots, vocab_size)
        self.b = n_slots
        self.vocab = vocab_size
        self._feed_tok = (ctypes.c_int * n_slots)()
        self._feed_pos = (ctypes.c_int * n_slots)()
        self._done = (ctypes.c_int * n_slots)()
        self._eprev = (ctypes.c_int * n_slots)()
        self._enext = (ctypes.c_int * n_slots)()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.sched_free(self._h)
        except Exception:
            pass

    def bind(self, slot: int, req: int, prompt: list[int], pos: int,
             token: int, max_steps: int, temperature: float, topp: float,
             rng_state: int) -> None:
        arr = (ctypes.c_int * len(prompt))(*prompt)
        self._lib.sched_bind(
            self._h, slot, req, arr, len(prompt), pos, token, max_steps,
            temperature, topp, rng_state & (2 ** 64 - 1),
        )

    def release(self, slot: int) -> None:
        self._lib.sched_release(self._h, slot)

    def advance(self, logits=None, sampled=None, bos_id: int = 1,
                eos_id: int = 2):
        """logits: np.float32 (B, vocab) C-contiguous, or sampled: np.int32
        (B,). Returns (feed_tok, feed_pos, done, emit_prev, emit_next) as
        lists."""
        import numpy as np

        lp = sp = None
        if sampled is not None:
            sa = np.ascontiguousarray(sampled, np.int32)
            sp = sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        else:
            la = np.ascontiguousarray(logits, np.float32)
            assert la.shape == (self.b, self.vocab), la.shape
            lp = la.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._lib.sched_advance(
            self._h, lp, sp, self._feed_tok, self._feed_pos, self._done,
            self._eprev, self._enext, bos_id, eos_id,
        )
        n = self.b
        return (
            list(self._feed_tok[:n]), list(self._feed_pos[:n]),
            list(self._done[:n]), list(self._eprev[:n]), list(self._enext[:n]),
        )
