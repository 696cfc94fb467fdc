"""Speed-augmented shards must actually flow into a training run:
preprocess --augmentation writes speed_{0.9,1.1}_train-* feature dumps
(reference: preprocess.py:158-167), create_shards packs them into the
train-*.arsh series, and train.py consumes the enlarged set."""

import glob
import os

import numpy as np
import pytest

from automatic_speech_recognition_tpu.data.audio_io import write_wav
from automatic_speech_recognition_tpu.data.shards import get_num_records

WORDS = ["GO", "STOP", "LEFT", "RIGHT", "UP", "DOWN"]


@pytest.fixture
def corpus(tmp_path, rng):
    root = str(tmp_path)
    dd = f"{root}/corpus/train/1/10"
    os.makedirs(dd)
    lines = []
    for u in range(6):
        uid = f"1-10-{u:04d}"
        lines.append(f"{uid} {' '.join(rng.choice(WORDS, 2))}")
        write_wav(f"{dd}/{uid}.wav",
                  rng.standard_normal(int(16000 * 0.5)) * 0.1, 16000)
    with open(f"{dd}/1-10.trans.txt", "w") as f:
        f.write("\n".join(lines))
    return root


def test_augmented_shards_flow_into_training(corpus, monkeypatch):
    root = corpus
    monkeypatch.chdir(root)
    flags = ["--unit", "char", "--feat_dim", "13", "--augmentation", "True",
             "--train_100hr_corpus_dir", f"{root}/corpus/train",
             "--train_360hr_corpus_dir", f"{root}/no360",
             "--train_500hr_corpus_dir", f"{root}/no500",
             "--dev_data_dir", f"{root}/nodev",
             "--test_data_dir", f"{root}/notest",
             "--feat_dir", f"{root}/feats", "--shard_dir", f"{root}/shards",
             "--save_dir", f"{root}/model", "--log_dir", f"{root}/log",
             "--summary_dir", f"{root}/sum",
             "--enc_units", "8", "--num_enc_channels", "4",
             "--num_enc_layers", "1", "--dec_units", "8",
             "--num_dec_layers", "1", "--embedding_size", "8",
             "--attention_size", "8", "--mode", "add",
             "--dropout_rate", "0.0", "--scheduled_sampling", "False",
             "--bucket_boundaries_train", "128",
             "--bucket_batch_sizes", "8",
             "--max_tokenlen_train", "16", "--maxlen", "128"]
    import preprocess, create_shards
    import train as train_cli

    preprocess.main(flags)
    aug = sorted(glob.glob(f"{root}/feats/speed_*-feats*.npy"))
    assert len(aug) == 2, aug  # speed_0.9 and speed_1.1 dumps
    create_shards.main(flags)
    files = sorted(glob.glob(f"{root}/shards/train-*.arsh"))
    # 6 original + 6 + 6 augmented records across the train shard series
    assert get_num_records(files) == 18
    train_cli.main(flags + ["--epoch", "1", "--steps_per_epoch", "2"])
    assert os.path.exists(f"{root}/model")
