"""Native ARSH reader parity: the C++ mmap reader must agree exactly with
the pure-Python ShardReader, record for record, and the BucketedLoader must
produce identical batches through either backend."""

import os
import shutil

import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.data import shards, shards_native
from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture
def shard_file(tmp_path, rng):
    feats, tokens = [], []
    for _ in range(20):
        T = int(rng.integers(10, 80))
        L = int(rng.integers(3, 15))
        feats.append(rng.standard_normal((T, 8, 3)).astype(np.float32))
        tokens.append(rng.integers(1, 30, (L,)).astype(np.int32))
    path = str(tmp_path / "t-1.arsh")
    shards.write_shard(path, feats, tokens)
    return path, feats, tokens


def test_native_available():
    assert shards_native.available()


def test_record_parity(shard_file):
    path, feats, tokens = shard_file
    py = shards.ShardReader(path)
    nat = shards_native.NativeShardReader(path)
    assert len(py) == len(nat) == 20
    assert (py.feat_dim, py.channels) == (nat.feat_dim, nat.channels)
    for i in range(20):
        fp, tp = py.record(i)
        fn, tn = nat.record(i)
        np.testing.assert_array_equal(fp, fn)
        np.testing.assert_array_equal(tp, tn)
        assert py.featlen(i) == nat.featlen(i) == len(feats[i])
        assert nat.tokenlen(i) == len(tokens[i])


def test_read_into_clips(shard_file):
    path, feats, tokens = shard_file
    nat = shards_native.NativeShardReader(path)
    feat_row = np.zeros((5, 8, 3), np.float32)
    tok_row = np.zeros((2,), np.int32)
    T, L = nat.read_into(3, feat_row, tok_row)
    assert T == min(5, len(feats[3])) and L == min(2, len(tokens[3]))
    np.testing.assert_array_equal(feat_row[:T], feats[3][:T])
    np.testing.assert_array_equal(tok_row[:L], tokens[3][:L])


def test_corrupt_shard_rejected(tmp_path):
    bad = tmp_path / "bad-1.arsh"
    bad.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError):
        shards_native.NativeShardReader(str(bad))
    with pytest.raises(ValueError):
        shards.ShardReader(str(bad))
    truncated = tmp_path / "trunc-1.arsh"
    truncated.write_bytes(b"ARSH" + b"\x00" * 8)  # shorter than header
    with pytest.raises(ValueError):
        shards_native.NativeShardReader(str(truncated))


def test_loader_backend_parity(shard_file):
    path, _, _ = shard_file
    cfg = Config(feat_dim=8, bucket_boundaries_train=(40, 80), bucket_boundaries_eval=(40, 80),
                 bucket_batch_sizes=(4, 4), max_tokenlen_train=16,
                 max_tokenlen_eval=16)
    batches_py = list(BucketedLoader([path], cfg, is_training=False,
                                     use_native=False))
    batches_nat = list(BucketedLoader([path], cfg, is_training=False,
                                      use_native=True))
    assert len(batches_py) == len(batches_nat)
    for bp, bn in zip(batches_py, batches_nat):
        for xp, xn in zip(bp, bn):
            np.testing.assert_array_equal(xp, xn)
