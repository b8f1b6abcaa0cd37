"""CLIP-compatible byte-level BPE tokenizer (pure Python, no torch).

Produces token ids identical to the OpenAI CLIP tokenizer used by the
reference (``src/third_party/open_clip/simple_tokenizer.py:62-132`` and
``tokenize()`` at ``src/third_party/open_clip/clip.py:191-227``): 49408-entry
vocab, ``<|startoftext|>``/``<|endoftext|>`` = 49406/49407, context length 77,
zero padding, truncate-with-forced-EOT.

The vocab/merges artifact (``bpe_simple_vocab_16e6.txt.gz``, the standard CLIP
BPE file shipped with every CLIP distribution) is *not* bundled; it is located
at runtime via :func:`find_vocab_file`.  Set ``KEDS_TPU_BPE_VOCAB`` or pass an
explicit path.

Implementation notes (clean-room, matching observable behaviour):

* Unicode normalisation: the reference runs ``ftfy.fix_text`` before
  tokenizing.  ``ftfy`` is an optional dependency here; when absent we fall
  back to double HTML-unescape + NFC normalisation, which is identical for
  all well-formed text (ftfy only changes mojibake).
* The merge loop is the canonical GPT-2 greedy lowest-rank-first algorithm.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np
import regex as _re

try:  # optional; reference hard-requires it
    import ftfy  # type: ignore

    _HAVE_FTFY = True
except Exception:  # pragma: no cover - environment without ftfy
    ftfy = None
    _HAVE_FTFY = False

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408
SOT_TOKEN = 49406
EOT_TOKEN = 49407

_VOCAB_BASENAME = "bpe_simple_vocab_16e6.txt.gz"

# Candidate locations for the standard CLIP BPE artifact, in priority order.
_VOCAB_SEARCH_PATHS = (
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", _VOCAB_BASENAME),
    os.path.expanduser(os.path.join("~", ".cache", "clip", _VOCAB_BASENAME)),
    os.path.expanduser(os.path.join("~", ".cache", "keds_tpu", _VOCAB_BASENAME)),
    # Environment-provided artifact (e.g. a mounted reference checkout).
    os.path.join("/root/reference/src/third_party/open_clip", _VOCAB_BASENAME),
)


def find_vocab_file(path: str | None = None) -> str:
    """Locate the CLIP BPE merges file.  Raises FileNotFoundError if absent."""
    if path:
        # An explicitly requested path must exist — don't mask typos by
        # silently falling back to the search list.
        if os.path.isfile(path):
            return path
        raise FileNotFoundError(f"BPE vocab not found at explicit path: {path}")
    candidates: List[str] = []
    env = os.environ.get("KEDS_TPU_BPE_VOCAB")
    if env:
        candidates.append(env)
    candidates.extend(_VOCAB_SEARCH_PATHS)
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    raise FileNotFoundError(
        "CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz) not found. Provide it via "
        "KEDS_TPU_BPE_VOCAB, an explicit path, or ~/.cache/clip/."
    )


@functools.lru_cache()
def _byte_unicode_table() -> dict:
    """GPT-2 byte→unicode mapping: printable latin-1 bytes keep their own
    codepoint; the remaining 68 bytes are remapped to 256+i so every byte has a
    visible, non-whitespace character."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    # Insertion order matters: the vocab lists kept bytes first (own
    # codepoint), then the remapped bytes — token ids depend on this order.
    table = {b: chr(b) for b in keep}
    shifted = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shifted)
            shifted += 1
    return table


def _clean_text(text: str) -> str:
    if _HAVE_FTFY:
        text = ftfy.fix_text(text)
    else:
        text = unicodedata.normalize("NFC", text)
    text = html.unescape(html.unescape(text))
    text = _re.sub(r"\s+", " ", text)
    return text.strip()


class ClipBPE:
    """Byte-level BPE encoder/decoder over the CLIP merges table."""

    # Same pretokenizer the CLIP tokenizer uses (contractions, letter runs,
    # single digits, punctuation runs, special tokens), case-insensitive.
    _PRETOKENIZE = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _re.IGNORECASE,
    )

    def __init__(self, vocab_path: str | None = None):
        vocab_path = find_vocab_file(vocab_path)
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # Line 0 is a header; the usable merge list is capped so that the
        # final vocab is exactly 49152-256-2+1 merges -> 49408 entries.
        n_merges = 49152 - 256 - 2 + 1 - 1
        merge_lines = lines[1 : 1 + n_merges]
        merges = [tuple(line.split()) for line in merge_lines]

        self._b2u = _byte_unicode_table()
        self._u2b = {u: b for b, u in self._b2u.items()}

        tokens: List[str] = list(self._b2u.values())
        tokens += [t + "</w>" for t in self._b2u.values()]
        tokens += ["".join(m) for m in merges]
        tokens += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(tokens)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self._rank = {m: i for i, m in enumerate(merges)}
        self._cache: dict = {
            "<|startoftext|>": ("<|startoftext|>",),
            "<|endoftext|>": ("<|endoftext|>",),
        }
        # Optional native (C++) core for cleaned ASCII text; transparently
        # falls back to the Python path (keds_tpu/native/bpe.cpp).
        try:
            from keds_tpu.native import load_native_bpe

            self._native = load_native_bpe(tokens, merges)
        except Exception:  # pragma: no cover
            self._native = None

    # -- BPE core ----------------------------------------------------------
    def _merge_word(self, token: str) -> tuple:
        """Apply BPE merges to one pre-token; returns the tuple of subwords."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        if len(parts) == 1:
            self._cache[token] = tuple(parts)
            return tuple(parts)
        rank = self._rank
        while len(parts) > 1:
            best_i, best_r = -1, None
            for i in range(len(parts) - 1):
                r = rank.get((parts[i], parts[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            pair = (parts[best_i], parts[best_i + 1])
            # Merge every occurrence of this pair, left to right.
            out: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and (parts[i], parts[i + 1]) == pair:
                    out.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        result = tuple(parts)
        self._cache[token] = result
        return result

    def _encode_cleaned(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self._PRETOKENIZE.findall(text):
            mapped = "".join(self._b2u[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[sub] for sub in self._merge_word(mapped))
        return ids

    def encode(self, text: str) -> List[int]:
        text = _clean_text(text).lower()
        if self._native is not None and text.isascii() and "\n" not in text:
            return self._native.encode_batch([text])[0]
        return self._encode_cleaned(text)

    def encode_batch(self, texts: Sequence[str]) -> List[List[int]]:
        """Batch encode; ASCII strings go through the native core in one
        ctypes call, the rest through the Python path."""
        cleaned = [_clean_text(t).lower() for t in texts]
        out: List[Optional[List[int]]] = [None] * len(cleaned)
        native_idx = []
        if self._native is not None:
            native_idx = [i for i, t in enumerate(cleaned)
                          if t.isascii() and "\n" not in t]
            if native_idx:
                encoded = self._native.encode_batch([cleaned[i] for i in native_idx])
                for i, ids in zip(native_idx, encoded):
                    out[i] = ids
        for i, t in enumerate(cleaned):
            if out[i] is None:
                out[i] = self._encode_cleaned(t)
        return out  # type: ignore[return-value]

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self._u2b[c] for c in text if c in self._u2b)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer(vocab_path: str | None = None) -> ClipBPE:
    return ClipBPE(vocab_path)


def tokenize(
    texts: Union[str, Sequence[str]],
    context_length: int = CONTEXT_LENGTH,
    truncate: bool = True,
    vocab_path: str | None = None,
) -> np.ndarray:
    """Tokenize text(s) into a ``(N, context_length)`` int32 array.

    Matches the reference ``tokenize()`` (``src/third_party/open_clip/clip.py:
    191-227``): SOT + ids + EOT, zero-padded; over-long sequences are truncated
    with the final token forced to EOT.
    """
    if isinstance(texts, str):
        texts = [texts]
    bpe = get_tokenizer(vocab_path)
    encoded = bpe.encode_batch(list(texts))
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text_ids in enumerate(encoded):
        ids = [SOT_TOKEN] + text_ids + [EOT_TOKEN]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {texts[row]!r} is too long for context length {context_length}"
                )
            ids = ids[:context_length]
            ids[-1] = EOT_TOKEN
        out[row, : len(ids)] = ids
    return out


# Text-length buckets for composed-query programs.  The splice pools at
# eot+(K-1) and a CAUSAL tower's outputs at those positions are
# bit-identical whether or not the dead zero tail past every row's pool
# index is computed — so the batch's host-known max caption length picks
# the shortest bucket (S=16/32 instead of 77 for realistic captions; +3.1%
# serving headline, BENCH_NOTES round-4).  A small fixed set bounds program
# compiles (one per bucket through a remote-compile tunnel).
TEXT_BUCKETS = (16, 32, 77)


def token_needs(tx, n_pseudo: int = 3) -> np.ndarray:
    """Per-row pool-cover need of a token batch: each row's EOT index plus
    the splice shift (``n_pseudo``); a bucket of width >= need computes the
    row's pooled output bit-exactly (causality — see :func:`bucket_text`).
    Host-side, cheap, and a pure function of the tokens — rank-consistent
    multi-process bucketing precomputes this per SAMPLE so every rank can
    derive the same per-step global bucket from the shared permutation
    without communication (round-4 VERDICT item 1)."""
    tx = np.asarray(tx)
    return (np.argmax(tx == EOT_TOKEN, axis=-1) + n_pseudo).astype(np.int32)


def bucket_for(need: int, buckets=TEXT_BUCKETS, full: int = 77) -> int:
    """Smallest bucket width covering ``need`` (the max pool index + 1);
    falls back to the full width when no bucket covers it."""
    for b in buckets:
        if need <= b:
            return min(b, full)
    return full


def bucket_text(tx, buckets=TEXT_BUCKETS, n_pseudo: int = 3) -> np.ndarray:
    """Trim a (B, 77) token batch to the shortest bucket covering every
    row's post-splice pool index; rows whose EOT runs past the largest
    covering bucket keep the full width.  ``n_pseudo``: K of the downstream
    splice — the retrieval-mode splice shifts the tail right by K-1 and
    pools at eot+(K-1) (serving/eval, K=3), the in-place train-mode splice
    pools at eot (pass 1)."""
    tx = np.asarray(tx)
    if tx.shape[1] <= buckets[0]:
        return tx
    # the bucket must cover the pool index (index < S)
    b = bucket_for(int(token_needs(tx, n_pseudo).max()), buckets, tx.shape[1])
    return tx[:, :b] if b < tx.shape[1] else tx


@functools.lru_cache()
def star_token_id(vocab_path: str | None = None) -> int:
    """Token id of the ``*`` placeholder (the reference computes this as
    ``tokenize(["*"])[0][1]``, e.g. ``src/eval_utils.py:200``)."""
    return int(tokenize(["*"], vocab_path=vocab_path)[0][1])
