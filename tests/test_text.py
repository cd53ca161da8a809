import numpy as np
import pytest

from cmtts_tpu.text import text_to_sequence, sequence_to_text, sil_phonemes_ids
from cmtts_tpu.text.symbols import symbols, symbol_to_id, VOCAB_SIZE
from cmtts_tpu.text.numbers_norm import normalize_numbers, number_to_words


def test_symbol_inventory():
    # pad + special + punct(10) + letters(52) + arpabet(84) + pinyin(209) + sil(3)
    assert len(symbols) == 360
    assert VOCAB_SIZE == 361
    assert symbols[0] == "_"
    assert symbols[-3:] == ["@sp", "@spn", "@sil"]
    assert "@AH0" in symbol_to_id and "@ZH" in symbol_to_id
    assert "@zh" in symbol_to_id and "@uang4" in symbol_to_id


def test_text_to_sequence_roundtrip_phonemes():
    seq = text_to_sequence("{HH AH0 L OW1} world", ["english_cleaners"])
    assert all(0 < s < len(symbols) for s in seq)
    txt = sequence_to_text(seq)
    assert txt.startswith("{HH AH0 L OW1}") or txt.startswith("{HH}")
    # silence markers map to dedicated ids
    sil = sil_phonemes_ids()
    assert len(sil) == 3
    sp_seq = text_to_sequence("{sp}", ["english_cleaners"])
    assert sp_seq == [symbol_to_id["@sp"]]


def test_cleaner_numbers():
    assert normalize_numbers("12") == "twelve"
    # keithito reads 1000<n<3000 year-style (inflect group=2)
    assert normalize_numbers("1,234") == "twelve thirty-four"
    assert normalize_numbers("3,456") == "three thousand four hundred fifty-six"
    assert normalize_numbers("$5.50") == "five dollars, fifty cents"
    assert normalize_numbers("3rd") == "third"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("1.5") == "one point five"
    assert number_to_words(1000000) == "one million"


def test_text_cleaning_ascii():
    seq = text_to_sequence("Héllo wörld!", ["english_cleaners"])
    txt = sequence_to_text(seq)
    assert txt == "hello world!"


def test_year_expansion():
    assert normalize_numbers("1984") == "nineteen eighty-four"
    assert normalize_numbers("1900") == "nineteen hundred"
    assert normalize_numbers("2003") == "two thousand three"


def test_preprocess_english_edge_inputs():
    """The single-mode text frontend degrades gracefully: empty or
    punctuation-only text becomes one {sp}, OOV words without a lexicon
    or g2p become spn markers — never a crash (reference
    synthesize.py:168-192 would crash without g2p_en)."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    try:
        from synthesize import preprocess_english
    finally:
        sys.path.pop(0)

    for txt in ("...", "", "hello world", "xyzzyqq word"):
        seq = np.asarray(preprocess_english(txt, "/nonexistent-lex",
                                            ["english_cleaners"]))
        assert seq.ndim == 1 and seq.size >= 1
        assert (seq > 0).all()
