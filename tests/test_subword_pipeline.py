"""Subword (CharBPE) pipeline end-to-end through the real CLIs:
train_subword -> preprocess -> create_shards -> train -> test -> decode,
with location-aware attention (the published-recipe configuration family,
run.sh:2-27)."""

import os
import shutil

import numpy as np
import pytest

from automatic_speech_recognition_tpu.data.audio_io import write_wav

WORDS = ["HELLO", "WORLD", "SPEECH", "RECOGNITION", "MODEL", "LISTEN"]


@pytest.fixture
def corpus(tmp_path, rng):
    root = str(tmp_path)
    for chap in (10, 11):
        dd = f"{root}/corpus/train/1/{chap}"
        os.makedirs(dd)
        lines = []
        for u in range(6):
            uid = f"1-{chap}-{u:04d}"
            text = " ".join(rng.choice(WORDS, rng.integers(2, 4)))
            lines.append(f"{uid} {text}")
            write_wav(f"{dd}/{uid}.wav",
                      rng.standard_normal(int(16000 * 0.8)) * 0.1, 16000)
        with open(f"{dd}/1-{chap}.trans.txt", "w") as f:
            f.write("\n".join(lines))
    shutil.copytree(f"{root}/corpus/train", f"{root}/corpus/dev")
    return root


def test_subword_cli_pipeline(corpus, monkeypatch):
    root = corpus
    monkeypatch.chdir(root)
    flags = ["--unit", "subword", "--feat_dim", "13",
             "--train_100hr_corpus_dir", f"{root}/corpus/train",
             "--train_360hr_corpus_dir", f"{root}/no360",
             "--train_500hr_corpus_dir", f"{root}/no500",
             "--dev_data_dir", f"{root}/corpus/dev",
             "--test_data_dir", f"{root}/notest",
             "--feat_dir", f"{root}/feats", "--shard_dir", f"{root}/shards",
             "--subword_dir", f"{root}/subword",
             "--save_dir", f"{root}/model", "--log_dir", f"{root}/log",
             "--summary_dir", f"{root}/sum",
             "--enc_units", "16", "--num_enc_channels", "4",
             "--num_enc_layers", "1", "--dec_units", "16",
             "--num_dec_layers", "1", "--embedding_size", "8",
             "--attention_size", "8", "--mode", "loc",
             "--loc_kernel_size", "11", "--loc_num_channels", "4",
             "--dropout_rate", "0.0", "--scheduled_sampling", "False",
             "--bucket_boundaries_train", "128,256",
             "--bucket_boundaries_eval", "128,256",
             "--bucket_batch_sizes", "8,8",
             "--max_tokenlen_train", "24", "--max_tokenlen_eval", "24",
             "--maxlen", "256"]
    import train_subword, preprocess, create_shards
    import train as train_cli, test as test_cli, decode as decode_cli

    train_subword.main(flags + ["--size", "60"])
    assert os.path.exists(f"{root}/subword/bpe-vocab.json")
    preprocess.main(flags)
    assert os.path.exists(f"{root}/feats/train-100-subwords.npy")
    create_shards.main(flags)
    train_cli.main(flags + ["--epoch", "1", "--steps_per_epoch", "2"])
    wer = test_cli.main(flags + ["--split", "dev", "--convert_rate", "0.3"])
    assert np.isfinite(wer)
    wer_b = decode_cli.main(flags + ["--split", "dev", "--beam_size", "2",
                                     "--convert_rate", "0.2",
                                     "--decode_batch", "4"])
    assert np.isfinite(wer_b)
