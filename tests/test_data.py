"""Data layer tests: WAV IO roundtrip, ARSH shard roundtrip, bucketing."""

import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.data import audio_io, shards
from automatic_speech_recognition_tpu.data.pipeline import (
    BucketedLoader, DevicePrefetcher, bucket_of)


def test_wav_roundtrip(tmp_path, rng):
    sig = np.clip(rng.standard_normal(16000) * 0.2, -1, 1)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, sig, 16000)
    back, fs = audio_io.read_wav(p)
    assert fs == 16000
    assert back.dtype == np.float64
    # write scales by 32767 (round), read divides by 32768
    np.testing.assert_allclose(back, sig, atol=1.6 / 32768)


def test_shard_roundtrip(tmp_path, rng):
    feats = [rng.standard_normal((t, 5, 3)).astype(np.float32)
             for t in (10, 20, 7)]
    tokens = [np.arange(n, dtype=np.int32) + 1 for n in (4, 6, 2)]
    p = str(tmp_path / "x.arsh")
    shards.write_shard(p, feats, tokens)
    r = shards.ShardReader(p)
    assert len(r) == 3
    for i in range(3):
        f, t = r.record(i)
        np.testing.assert_array_equal(f, feats[i])
        np.testing.assert_array_equal(t, tokens[i])
        assert r.featlen(i) == feats[i].shape[0]
    assert shards.get_num_records([p]) == 3


def test_create_shards_maxlen_and_split(tmp_path, rng):
    feats = [rng.standard_normal((t, 4, 3)).astype(np.float32)
             for t in [5, 100, 8, 12, 200, 9, 7, 11]]
    tokens = [[1, 2]] * 8
    paths = shards.create_shards(feats, tokens, str(tmp_path / "train"),
                                 records_per_shard=3, maxlen=50, seed=0)
    total = shards.get_num_records(paths)
    assert total == 6  # two dropped at maxlen 50
    assert len(paths) == 2


def _make_shards(tmp_path, rng, n=40, seed=0):
    feats = [rng.standard_normal((int(rng.integers(5, 60)), 4, 3)).astype(np.float32)
             for _ in range(n)]
    tokens = [np.asarray(rng.integers(1, 30, size=int(rng.integers(2, 10))),
                         np.int32) for _ in range(n)]
    return shards.create_shards(feats, tokens, str(tmp_path / "tr"),
                                records_per_shard=20, seed=seed)


def test_bucket_of():
    # strict < like tf.data bucket_by_sequence_length: a length exactly at
    # a boundary belongs to the NEXT bucket
    assert bucket_of(5, (10, 20)) == 0
    assert bucket_of(10, (10, 20)) == 1
    assert bucket_of(11, (10, 20)) == 1
    assert bucket_of(19, (10, 20)) == 1
    assert bucket_of(20, (10, 20)) is None
    assert bucket_of(21, (10, 20)) is None


def test_bucketed_loader_shapes(tmp_path, rng):
    cfg = Config(feat_dim=4, bucket_boundaries_train=(16, 32, 64),
                 bucket_boundaries_eval=(16, 32, 64),
                 bucket_batch_sizes=(4, 4, 4), max_tokenlen_train=12,
                 max_tokenlen_eval=12)
    paths = _make_shards(tmp_path, rng)
    loader = BucketedLoader(paths, cfg, is_training=False)
    seen = 0
    for audio, audiolen, toks, toklen in loader:
        B, T, D, C = audio.shape
        assert T in (16, 32, 64)
        assert (D, C) == (4, 3)
        assert toks.shape[1] == 12
        assert np.all(audiolen <= T)
        # padding beyond audiolen is zero
        for i in range(B):
            assert np.all(audio[i, audiolen[i]:] == 0)
        seen += B
    assert seen == 40  # eval pass covers everything


def test_bucketed_loader_train_repeats(tmp_path, rng):
    cfg = Config(feat_dim=4, bucket_boundaries_train=(64,), bucket_boundaries_eval=(64,),
                 bucket_batch_sizes=(8,), max_tokenlen_train=12)
    paths = _make_shards(tmp_path, rng)
    it = iter(BucketedLoader(paths, cfg, is_training=True, seed=1))
    batches = [next(it) for _ in range(12)]  # > one epoch worth
    assert all(b[0].shape[0] == 8 for b in batches)


def test_empty_training_stream_refuses(tmp_path, rng):
    # An infinite training stream whose records never fill a batch must
    # raise, not spin forever (train.py used to hang silently at the
    # first next() on an empty/out-of-range corpus).
    feats = [rng.standard_normal((100, 4, 3)).astype(np.float32)]
    tokens = [np.asarray([1, 2], np.int32)]
    paths = shards.create_shards(feats, tokens, str(tmp_path / "tr"),
                                 records_per_shard=5, seed=0)
    cfg = Config(feat_dim=4, bucket_boundaries_train=(16,), bucket_batch_sizes=(4,))
    with pytest.raises(ValueError, match="training stream is empty"):
        next(iter(BucketedLoader(paths, cfg, is_training=True)))
    # eval of the same corpus stays a quiet zero-batch pass
    cfg_e = cfg.replace(bucket_boundaries_eval=(16,))
    assert list(BucketedLoader(paths, cfg_e, is_training=False)) == []


def test_prefetcher_passthrough_and_errors():
    out = list(DevicePrefetcher(iter([1, 2, 3]), lambda x: x * 2, depth=2))
    assert out == [2, 4, 6]

    def boom():
        yield 1
        raise RuntimeError("io error")

    pf = DevicePrefetcher(boom(), lambda x: x, depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        list(pf)


def test_per_bucket_token_padding(tmp_path, rng):
    """Token width follows the batch max rounded to token_pad_quantum
    (VERDICT: reference runs dec_steps = max(tokenlen) per batch,
    las/las.py:246-249) instead of always max_tokenlen."""
    cfg = Config(feat_dim=4, bucket_boundaries_train=(64,), bucket_boundaries_eval=(64,),
                 bucket_batch_sizes=(8,), max_tokenlen_train=219,
                 max_tokenlen_eval=219, token_pad_quantum=4)
    paths = _make_shards(tmp_path, rng)
    for audio, audiolen, toks, toklen in BucketedLoader(
            paths, cfg, is_training=False):
        pad = toks.shape[1]
        assert pad % 4 == 0 and pad >= int(toklen.max())
        assert pad - int(toklen.max()) < 4     # tight quantized padding
        assert np.all(toks[np.arange(len(toklen)), toklen - 1] > 0)
    # compat off-switch restores the old full-width padding
    cfg2 = cfg.replace(per_bucket_tokenlen=False)
    for batch in BucketedLoader(paths, cfg2, is_training=False):
        assert batch[2].shape[1] == 219


def test_batches_per_epoch_derivation(tmp_path, rng):
    """batches_per_epoch must equal per-bucket count // batch (train,
    partial batches carry over) and ceil (eval, leftovers flush)."""
    cfg = Config(feat_dim=4, bucket_boundaries_train=(16, 32, 64),
                 bucket_boundaries_eval=(16, 32, 64),
                 bucket_batch_sizes=(4, 4, 4), max_tokenlen_train=12,
                 max_tokenlen_eval=12)
    paths = _make_shards(tmp_path, rng)
    train = BucketedLoader(paths, cfg, is_training=True)
    ev = BucketedLoader(paths, cfg, is_training=False)
    # ground truth straight from the shard index
    counts = {}
    for r in train._readers.values():
        for i in range(len(r)):
            b = bucket_of(r.featlen(i), (16, 32, 64))
            counts[b] = counts.get(b, 0) + 1
    want_train = sum(c // 4 for c in counts.values())
    want_eval = sum(-(-c // 4) for c in counts.values())
    assert train.batches_per_epoch() == max(want_train, 1)
    assert ev.batches_per_epoch() == want_eval
    # the eval derivation matches what one real pass actually yields
    assert sum(1 for _ in ev) == want_eval
    # every record beyond the last boundary: eval reports the honest 0
    # (a real pass yields nothing); training floors at 1 so the infinite
    # stream's epoch accounting can't stall
    tiny = cfg.replace(bucket_boundaries_train=(2, 3, 4),
                       bucket_boundaries_eval=(2, 3, 4))
    ev0 = BucketedLoader(paths, tiny, is_training=False)
    assert ev0.batches_per_epoch() == 0
    assert sum(1 for _ in ev0) == 0
    assert BucketedLoader(paths, tiny, is_training=True
                          ).batches_per_epoch() == 1


def test_bf16_feed_matches_device_cast(tmp_path, rng):
    """Under --dtype bfloat16 the loader feeds bf16 feature batches; this
    must be BIT-identical to feeding f32 and letting compute_cast downcast
    on device (models/las.py compute_cast is the first consumer), since
    numpy/ml_dtypes and XLA both round-to-nearest-even."""
    import ml_dtypes
    import jax.numpy as jnp

    paths = _make_shards(tmp_path, rng)
    base = dict(feat_dim=4, bucket_boundaries_train=(64,),
                bucket_boundaries_eval=(64,), bucket_batch_sizes=(4,),
                max_tokenlen_train=12, max_tokenlen_eval=12)
    cfg_f32 = Config(**base)
    cfg_bf16 = Config(dtype="bfloat16", **base)

    b32 = [b for b in BucketedLoader(paths, cfg_f32, is_training=False,
                                     seed=3)]
    b16 = [b for b in BucketedLoader(paths, cfg_bf16, is_training=False,
                                     seed=3)]
    assert b32[0][0].dtype == np.float32
    assert b16[0][0].dtype == ml_dtypes.bfloat16
    for (a32, l32, t32, k32), (a16, l16, t16, k16) in zip(b32, b16):
        # host bf16 cast == device bf16 cast, element for element
        dev = jnp.asarray(a32).astype(jnp.bfloat16)
        assert np.array_equal(np.asarray(dev), np.asarray(a16))
        assert np.array_equal(l32, l16) and np.array_equal(t32, t16)


def test_bf16_feed_excluded_for_audio_shards(tmp_path, rng):
    """Raw-audio shards must keep f32 waveforms: the on-device frontend
    consumes them BEFORE any compute cast, so a host downcast would
    change numerics (not just re-order a cast)."""
    from automatic_speech_recognition_tpu.data import shards

    wavs = [rng.standard_normal((int(rng.integers(400, 800)), 1, 1))
            .astype(np.float32) for _ in range(8)]
    tokens = [np.asarray(rng.integers(1, 30, size=4), np.int32)
              for _ in range(8)]
    paths = shards.create_shards(wavs, tokens, str(tmp_path / "aw"),
                                 records_per_shard=8, seed=0)
    cfg = Config(dtype="bfloat16", audio_shards=True,
                 bucket_boundaries_train=(8,), bucket_boundaries_eval=(8,),
                 bucket_batch_sizes=(4,), max_tokenlen_train=8,
                 max_tokenlen_eval=8)
    loader = BucketedLoader(paths, cfg, is_training=False)
    batch = next(iter(loader))
    assert batch[0].dtype == np.float32


def test_feat_dim_mismatch_refused(tmp_path, rng):
    """A preprocess/train --feat_dim disagreement must be refused with a
    readable message at loader construction, not surface as an einsum
    shape error deep inside the first forward."""
    import pytest

    paths = _make_shards(tmp_path, rng)  # feat_dim 4
    cfg = Config(feat_dim=39, bucket_boundaries_train=(64,),
                 bucket_boundaries_eval=(64,), bucket_batch_sizes=(4,))
    with pytest.raises(ValueError, match="feat_dim 4 but the config says 39"):
        BucketedLoader(paths, cfg, is_training=False)
