"""Text frontend golden tests vs the reference pipeline
(datasets/tts_dataset.py:136-146, run/say.py:43-60)."""

import numpy as np
import pytest

from tacotron2_tpu.config import ALLOWED_CHARS
from tacotron2_tpu.text import (
    CharEncoder,
    ascii_transliterate,
    expand_abbreviations,
    normalize_text,
)

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


def test_transliterate_ascii_passthrough():
    s = "Hello, World! 123"
    assert ascii_transliterate(s) == s


def test_transliterate_accents_and_ligatures():
    assert ascii_transliterate("café") == "cafe"
    assert ascii_transliterate("naïve") == "naive"
    assert ascii_transliterate("Æther œuvre ß") == "AEther oeuvre ss"
    assert ascii_transliterate("“quoted” — dash… ‘single’") == '"quoted" -- dash... \'single\''


def test_expand_abbreviations_golden():
    # same 18 rules as the reference
    assert expand_abbreviations("mr. smith met dr. jones") == "mister smith met doctor jones"
    assert expand_abbreviations("Mrs. Doe") == "misess Doe"
    assert expand_abbreviations("ft. worth co. ltd.") == "fort worth company limited"
    # no trailing dot -> no expansion
    assert expand_abbreviations("mr smith") == "mr smith"
    # must be a word boundary
    assert expand_abbreviations("harmr. x") == "harmr. x"


def test_normalize_pipeline_order():
    # strip happens BEFORE abbreviation expansion in the reference
    out = normalize_text("Mr. Smith #1!", LJ_CHARS, end_token="^", do_expand_abbreviations=True)
    assert out == "mister smith !^"


def test_normalize_strips_disallowed():
    out = normalize_text("Hello_World@2024", LJ_CHARS, end_token=None)
    assert out == "helloworld"


def test_char_encoder_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.preprocessing")
    enc_ref = sklearn.OrdinalEncoder()
    chars = list(LJ_CHARS) + ["^"]
    enc_ref.fit([[c] for c in chars])
    ours = CharEncoder(LJ_CHARS, end_token="^")
    text = "hello, world!^"
    ref_idx = enc_ref.transform([[c] for c in text]).squeeze(-1).astype(np.int64) + 1
    np.testing.assert_array_equal(ours.encode(text), ref_idx)


def test_char_encoder_uppercase_default_charset():
    ours = CharEncoder(ALLOWED_CHARS, end_token="^")
    assert ours.vocab_size == len(ALLOWED_CHARS) + 1
    idx = ours.encode("AaZz^")
    assert ours.decode(idx) == "AaZz^"


def test_encode_batch_padding():
    ours = CharEncoder(LJ_CHARS, end_token="^")
    batch, lens = ours.encode_batch(["ab^", "a^"])
    assert batch.shape == (2, 3)
    assert batch[1, 2] == 0  # pad
    np.testing.assert_array_equal(lens, [3, 2])


def test_end_token_collision_rejected():
    with pytest.raises(ValueError):
        CharEncoder(LJ_CHARS, end_token="a")
