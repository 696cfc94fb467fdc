"""Tokenizer tests: char vocab contract, CharBPE round trip, and encode
conformance against the real HuggingFace CharBPETokenizer (the library the
reference uses, utils/tokenizer.py:2) when available."""

import os

import pytest

from automatic_speech_recognition_tpu.utils.tokenizer import (
    CharBPE, CharEncoder, SubwordEncoder, SPECIAL_TOKENS, train_subword_tokenizer)

CORPUS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "HELLO WORLD THIS IS A TEST OF THE TOKENIZER",
    "SPEECH RECOGNITION WITH LISTEN ATTEND AND SPELL",
    "THE THE THE QUICK QUICK BROWN",
    "ATTENTION IS ALL YOU NEED FOR SPEECH",
] * 4


def test_char_vocab_layout():
    enc = CharEncoder()
    # ids 0-3 specials, 4..29 A..Z (reference: utils/tokenizer.py:4-23)
    assert enc.token_to_id["<PAD>"] == 0
    assert enc.token_to_id["<SOS>"] == 1
    assert enc.token_to_id["<EOS>"] == 2
    assert enc.token_to_id["<SPACE>"] == 3
    assert enc.token_to_id["A"] == 4
    assert enc.token_to_id["Z"] == 29
    assert enc.get_vocab_size() == 30


def test_char_encode_decode_roundtrip():
    enc = CharEncoder()
    s = "HELLO WORLD"
    ids = enc.encode(s, with_eos=True)
    assert ids[-1] == 2
    assert ids[5] == 3  # space
    assert enc.decode(ids) == s


def test_char_encode_matches_reference_semantics():
    enc = CharEncoder()
    # 'AB C' -> [A=4, B=5, SPACE=3, C=6, EOS=2]
    assert enc.encode("AB C", with_eos=True) == [4, 5, 3, 6, 2]


def test_bpe_train_and_roundtrip(tmp_path):
    bpe = CharBPE.train(CORPUS, vocab_size=120, min_frequency=2)
    for line in CORPUS[:5]:
        ids = bpe.encode(line)
        assert bpe.decode(ids) == line
    # persistence roundtrip
    bpe.save(str(tmp_path), "bpe")
    bpe2 = CharBPE.load(str(tmp_path / "bpe-vocab.json"), str(tmp_path / "bpe-merges.txt"))
    for line in CORPUS[:5]:
        assert bpe2.encode(line) == bpe.encode(line)


def test_subword_encoder_eos(tmp_path):
    (tmp_path / "corpus_all.txt").write_text("\n".join(CORPUS))
    train_subword_tokenizer(120, SPECIAL_TOKENS, str(tmp_path))
    enc = SubwordEncoder(str(tmp_path))
    ids = enc.encode("HELLO WORLD", with_eos=True)
    assert ids[-1] == 2  # reference: utils/tokenizer.py:71-72
    assert enc.decode(ids) == "HELLO WORLD"
    assert enc.get_vocab_size() >= 30


def test_bpe_unknown_char_maps_to_unk():
    bpe = CharBPE.train(CORPUS, vocab_size=80, min_frequency=2)
    ids = bpe.encode("Ω")
    assert ids == [bpe.unk_id]


@pytest.mark.skipif(
    pytest.importorskip("tokenizers", reason="hf tokenizers absent") is None,
    reason="needs tokenizers")
def test_bpe_encode_conformance_with_hf(tmp_path):
    """Encode with OUR BPE using files trained by the REAL HF CharBPETokenizer:
    ids must match exactly (vocab-file contract of utils/tokenizer.py:53)."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import BertPreTokenizer
    from tokenizers.normalizers import BertNormalizer

    corpus_file = tmp_path / "corpus_all.txt"
    corpus_file.write_text("\n".join(CORPUS))

    hf = Tokenizer(BPE(unk_token="<unk>", end_of_word_suffix="</w>"))
    hf.normalizer = BertNormalizer(lowercase=False)
    hf.pre_tokenizer = BertPreTokenizer()
    trainer = BpeTrainer(vocab_size=120, min_frequency=2,
                         special_tokens=["<PAD>", "<SOS>", "<EOS>", "<unk>"],
                         end_of_word_suffix="</w>", show_progress=False)
    hf.train([str(corpus_file)], trainer)

    # dump HF model into the reference file format
    import json
    vocab = hf.get_vocab()
    (tmp_path / "bpe-vocab.json").write_text(json.dumps(vocab))
    model_json = json.loads(hf.to_str())
    merges = model_json["model"]["merges"]
    with open(tmp_path / "bpe-merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for m in merges:
            if isinstance(m, (list, tuple)):
                f.write(f"{m[0]} {m[1]}\n")
            else:
                f.write(m + "\n")

    ours = CharBPE.load(str(tmp_path / "bpe-vocab.json"), str(tmp_path / "bpe-merges.txt"))
    for line in CORPUS + ["THE QUICKEST BROWNISH FOXES", "ZEBRA XYLOPHONE"]:
        assert ours.encode(line) == hf.encode(line).ids, line
