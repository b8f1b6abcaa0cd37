"""Native (C++) BPE core vs the Python tokenizer: exact id parity on fuzzed
ASCII text; automatic fallback when disabled."""

import random
import string

import pytest

from keds_tpu import tokenizer as tk


def _vocab_present():
    try:
        tk.find_vocab_file()
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _vocab_present(), reason="BPE vocab not available")


def test_native_matches_python_fuzz():
    bpe = tk.get_tokenizer()
    if bpe._native is None:
        pytest.skip("native BPE not built in this environment")
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + " .,!?'-()[]{}:;/&%$#@*+=\"~^|\\<>"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 150)))
             for _ in range(2000)]
    texts += [
        "don't stop; it's 2024's best-seller (really?)",
        "!!'s punctuation-run apostrophe",
        "'twas the night", "a photo of * , a dog chasing a ball",
        "", "'", "''", "123abc!@#", "a" * 300,
    ]
    for t in texts:
        cleaned = tk._clean_text(t).lower()
        if not cleaned.isascii() or "\n" in cleaned:
            continue
        py = bpe._encode_cleaned(cleaned)
        nat = bpe._native.encode_batch([cleaned])[0]
        assert nat == py, repr(t)


def test_encode_batch_mixed_ascii_unicode():
    bpe = tk.get_tokenizer()
    texts = ["a red car", "café naïve", "a dog"]
    batch = bpe.encode_batch(texts)
    assert batch[0] == bpe._encode_cleaned("a red car")
    assert batch[1] == bpe._encode_cleaned(tk._clean_text("café naïve").lower())
    assert batch[2] == bpe._encode_cleaned("a dog")


def test_tokenize_uses_batch_path():
    import numpy as np

    out = tk.tokenize(["a red car", "a dog"])
    assert out.shape == (2, 77)
    assert (out[:, 0] == tk.SOT_TOKEN).all()
