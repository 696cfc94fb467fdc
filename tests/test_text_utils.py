"""WER / detokenization tests against hand-computed values."""

from automatic_speech_recognition_tpu.utils.text import (
    clean_lm_text, convert_idx_to_string, corpus_wer, edit_distance, lm_vocab,
    strip_punctuation, wer)
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder


def test_edit_distance_hand_computed():
    assert edit_distance("kitten", "sitting") == (3.0, 6)
    assert edit_distance(["a", "b"], ["a", "b"]) == (0.0, 2)
    assert edit_distance(["a"], []) == (1.0, 1)
    assert edit_distance([], ["a"])[0] == 1.0


def test_wer():
    ref = "the cat sat".split()
    hyp = "the bat sat".split()
    assert wer(ref, hyp) == 1 / 3


def test_corpus_wer_is_summed_not_averaged():
    refs = ["a b c d", "x"]
    hyps = ["a b c d", "y"]
    # 0 errors over 4 + 1 error over 1 => 1/5 (reference: test.py:127-136)
    assert corpus_wer(refs, hyps) == 1 / 5


def test_convert_idx_char_mode():
    enc = CharEncoder()
    ids = enc.encode("AB C", with_eos=True) + [9, 9]  # junk after EOS
    assert convert_idx_to_string(ids, enc.id_to_token, "char") == "AB C"


def test_convert_idx_subword_mode():
    id_to_token = {0: "HEL", 1: "LO</w>", 2: "WORLD</w>", 3: "<EOS>"}
    assert convert_idx_to_string([0, 1, 2, 3], id_to_token, "subword") == "HELLO WORLD"


def test_strip_punctuation():
    assert strip_punctuation("DON'T STOP, NOW!") == "DONT STOP NOW"


def test_clean_lm_text():
    out = clean_lm_text("hello, world!\nit's 42 degrees?\n\n")
    assert out == "HELLO WORLD. ITS  DEGREES."


def test_lm_vocab():
    v2i, i2v, n = lm_vocab()
    assert n == 28
    assert v2i["."] == 0 and v2i[" "] == 1 and v2i["A"] == 2 and v2i["Z"] == 27


def test_corpus_cer():
    from automatic_speech_recognition_tpu.utils.text import corpus_cer
    # "ABC" vs "ABC" perfect; "AB" vs "AX" one sub of 2 chars
    assert corpus_cer(["ABC"], ["ABC"]) == 0.0
    assert corpus_cer(["AB"], ["AX"]) == 0.5
    # corpus-level: summed distances over summed ref chars = (0+1)/5
    assert corpus_cer(["ABC", "AB"], ["ABC", "AX"]) == 1 / 5
    # empty hyp = full deletion cost
    assert corpus_cer(["ABCD"], [""]) == 1.0
