"""Build + ctypes binding for the native BPE core.

Compiled on demand with g++ into a per-version cached shared object; callers
fall back to the pure-Python tokenizer when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bpe.cpp")
_CACHE_DIR = os.environ.get(
    "KEDS_TPU_NATIVE_CACHE",
    os.path.expanduser("~/.cache/keds_tpu/native"),
)


def _build_so() -> Optional[str]:
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so_path = os.path.join(_CACHE_DIR, f"bpe_{digest}.so")
    if os.path.isfile(so_path):
        return so_path
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # pragma: no cover - no toolchain
        logging.info("native BPE build unavailable (%s); using Python path", e)
        return None


class NativeBPE:
    """ctypes wrapper over the C++ encoder.  ASCII-only; the Python tokenizer
    routes non-ASCII strings through its own path."""

    def __init__(self, lib: ctypes.CDLL, vocab_tokens: List[str], merge_lines: List[str]):
        self._lib = lib
        lib.bpe_init.restype = ctypes.c_int
        lib.bpe_init.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.c_char_p, ctypes.c_int64]
        lib.bpe_encode_batch.restype = ctypes.c_int64
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        vocab_buf = "\n".join(vocab_tokens).encode("utf-8", "surrogateescape")
        merges_buf = "\n".join(merge_lines).encode("utf-8")
        rc = lib.bpe_init(vocab_buf, len(vocab_buf), merges_buf, len(merges_buf))
        if rc != 0:
            raise RuntimeError(f"bpe_init failed: {rc}")

    def encode_batch(self, texts: List[str]) -> List[List[int]]:
        """texts must already be cleaned + lowercased ASCII without newlines."""
        joined = "\n".join(texts).encode("ascii")
        n = len(texts)
        capacity = max(4 * len(joined) + 64 * n, 1024)
        ids = np.empty(capacity, np.int32)
        offsets = np.empty(n + 1, np.int64)
        total = self._lib.bpe_encode_batch(
            joined, len(joined),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), capacity,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        )
        if total < 0:
            raise RuntimeError(f"bpe_encode_batch failed: {total}")
        return [ids[offsets[i]:offsets[i + 1]].tolist() for i in range(n)]


def load_native_bpe(vocab_tokens: List[str], merge_pairs: List[Tuple[str, str]]) -> Optional[NativeBPE]:
    if os.environ.get("KEDS_TPU_DISABLE_NATIVE"):
        return None
    so_path = _build_so()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        merge_lines = [f"{a} {b}" for a, b in merge_pairs]
        return NativeBPE(lib, vocab_tokens, merge_lines)
    except Exception as e:  # pragma: no cover
        logging.warning("native BPE unavailable (%s); using Python path", e)
        return None
