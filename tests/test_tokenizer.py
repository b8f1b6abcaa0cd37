"""Tokenizer parity tests.

Golden behaviour is defined by the reference tokenizer
(``src/third_party/open_clip/simple_tokenizer.py`` + ``clip.py:tokenize``).
When the reference checkout is mounted we import and *run* it (with ftfy
stubbed to identity if absent) and compare token ids exactly.
"""

import sys
import types

import numpy as np
import pytest

from keds_tpu import tokenizer as tk

TEXTS = [
    "a photo of",
    "a photo of * , a dog chasing a ball",
    "*",
    "a photo of * * * wearing a red hat",
    "This is a photo of a CAT!!!",
    "hello   world\twith   spaces",
    "don't stop; it's 2024's best-seller (really?)",
    "a cartoon of *",
    "1 2 33 456 numbers",
    "émigré café naïve — unicode façade",
    "",
    "x" * 400,  # forces truncation
]


def _vocab_present() -> bool:
    try:
        tk.find_vocab_file()
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _vocab_present(), reason="BPE vocab not available")


@pytest.fixture(scope="module")
def reference_tokenize(reference_src):
    """Import the reference tokenizer, stubbing ftfy if missing."""
    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            stub = types.ModuleType("ftfy")
            stub.fix_text = lambda s: s
            sys.modules["ftfy"] = stub
    sys.path.insert(0, str(reference_src))
    try:
        from third_party.open_clip.simple_tokenizer import SimpleTokenizer
    finally:
        sys.path.pop(0)
    ref_bpe = SimpleTokenizer()
    sot = ref_bpe.encoder["<|startoftext|>"]
    eot = ref_bpe.encoder["<|endoftext|>"]

    def ref_tokenize(texts, context_length=77):
        # Same padding/truncation contract as the reference clip.tokenize
        # (src/third_party/open_clip/clip.py:191-227), applied to the
        # reference BPE (importing clip.py itself needs torchvision).
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [sot] + ref_bpe.encode(text) + [eot]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = eot
            out[i, : len(ids)] = ids
        return out

    return ref_tokenize


def test_special_token_ids():
    assert tk.SOT_TOKEN == 49406
    assert tk.EOT_TOKEN == 49407
    bpe = tk.get_tokenizer()
    assert bpe.encoder["<|startoftext|>"] == 49406
    assert bpe.encoder["<|endoftext|>"] == 49407
    assert len(bpe.encoder) == tk.VOCAB_SIZE


def test_tokenize_shape_and_padding():
    out = tk.tokenize(["a photo of", "a dog"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == tk.SOT_TOKEN
    # padding is zero after EOT
    eot_pos = int(np.argmax(out[0] == tk.EOT_TOKEN))
    assert (out[0, eot_pos + 1 :] == 0).all()


def test_truncation_forces_eot():
    out = tk.tokenize(["word " * 200])
    assert out.shape == (1, 77)
    assert out[0, -1] == tk.EOT_TOKEN
    assert (out[0] != 0).all()


def test_roundtrip_decode():
    bpe = tk.get_tokenizer()
    text = "a photo of a small red car"
    assert bpe.decode(bpe.encode(text)).strip() == text


def test_star_token_is_single_token():
    row = tk.tokenize(["*"])[0]
    assert row[0] == tk.SOT_TOKEN and row[2] == tk.EOT_TOKEN
    assert tk.star_token_id() == int(row[1])


def test_parity_with_reference(reference_tokenize):
    ref = reference_tokenize(TEXTS)
    ours = tk.tokenize(TEXTS)
    np.testing.assert_array_equal(ours, ref)


def test_parity_encode_ids(reference_src, reference_tokenize):
    sys.path.insert(0, str(reference_src))
    try:
        from third_party.open_clip.simple_tokenizer import SimpleTokenizer
    finally:
        sys.path.pop(0)
    ref_bpe = SimpleTokenizer()
    bpe = tk.get_tokenizer()
    for text in TEXTS:
        if not text:
            continue
        assert bpe.encode(text) == ref_bpe.encode(text), text


def test_parity_unicode_fuzz(reference_src):
    """Random multi-script strings (NFC-normalized, as real ftfy would
    produce) must tokenize identically to the reference BPE."""
    import random
    import sys
    import unicodedata

    sys.path.insert(0, str(reference_src))
    try:
        from third_party.open_clip.simple_tokenizer import SimpleTokenizer
    finally:
        sys.path.pop(0)
    ref = SimpleTokenizer()
    bpe = tk.get_tokenizer()
    rng = random.Random(7)
    pools = [
        "àâçéèêëîïôùûüÿñ", "αβγδεζηθικλμν", "абвгдежзик",
        "日本語テキスト漢字", "한국어텍스트", "emoji 😀🎉🚀",
        "abcdefghijklmnopqrstuvwxyz0123456789 .,!?'",
    ]
    for _ in range(150):
        n = rng.randint(1, 60)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        s = unicodedata.normalize("NFC", s)
        assert bpe.encode(s) == ref.encode(s), repr(s)


def test_bucket_text_edges():
    """bucket_text edge cases: boundary needs, missing EOT, n_pseudo
    variants, already-short inputs."""
    import numpy as np

    from keds_tpu.tokenizer import EOT_TOKEN, SOT_TOKEN, bucket_text

    def row(eot_pos):
        r = np.zeros(77, np.int32)
        r[0] = SOT_TOKEN
        r[1:eot_pos] = 320
        r[eot_pos] = EOT_TOKEN
        return r

    # pool coverage boundaries (n_pseudo=3): eot=13 -> need 16 -> bucket 16;
    # eot=14 -> need 17 -> bucket 32
    assert bucket_text(np.stack([row(13)])).shape[1] == 16
    assert bucket_text(np.stack([row(14)])).shape[1] == 32
    # batch max decides: one long row promotes the whole batch
    assert bucket_text(np.stack([row(5), row(30)])).shape[1] == 77
    assert bucket_text(np.stack([row(5), row(28)])).shape[1] == 32
    # n_pseudo=1 (in-place train splice pools at eot): eot=15 fits 16
    assert bucket_text(np.stack([row(15)]), n_pseudo=1).shape[1] == 16
    assert bucket_text(np.stack([row(15)])).shape[1] == 32
    # eot beyond every bucket's coverage -> full width
    assert bucket_text(np.stack([row(76)])).shape[1] == 77
    # malformed row without EOT: argmax=0, trims to the smallest bucket —
    # garbage in, garbage out, but never an exception
    no_eot = np.zeros((1, 77), np.int32)
    no_eot[0, 0] = SOT_TOKEN
    assert bucket_text(no_eot).shape[1] == 16
    # already-short input passes through
    assert bucket_text(np.zeros((2, 12), np.int32)).shape[1] == 12
