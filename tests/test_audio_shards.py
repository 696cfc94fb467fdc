"""Raw-waveform shards (--audio_shards): the frontend fused into the
jitted train/eval dispatch instead of a preprocess feature stage.

Beyond-reference capability (the reference REQUIRES the speechpy
preprocess stage, reference preprocess.py:50-91 + create_tfrecord.py);
the contract under test is strict equivalence with the feature-shard
pipeline: same bucket membership, same model-side shapes, same numbers.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.data import shards
from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader
from automatic_speech_recognition_tpu.ops import frontend
from automatic_speech_recognition_tpu.ops.frontend_host import frame_params
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder
from automatic_speech_recognition_tpu.data.audio_io import write_wav

TINY = dict(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
            enc_units=16, num_enc_channels=4, num_enc_layers=1,
            dec_units=16, num_dec_layers=1, embedding_size=8,
            attention_size=8, mode="add", dropout_rate=0.0,
            scheduled_sampling=False, apply_bn=False, label_smoothing=False,
            bucket_boundaries_eval=(48, 64), bucket_batch_sizes=(4, 4),
            max_tokenlen_eval=12, lr=5e-3)


def _make_corpus(rng, n=8, lo=24, hi=60):
    """Signals whose frame counts land in [lo, hi) (both eval buckets by
    default)."""
    flen, fstride = frame_params(16000, 25, 10)
    tok = CharEncoder()
    signals, tokens = [], []
    for i in range(n):
        frames = int(rng.integers(lo, hi))
        S = flen + frames * fstride + int(rng.integers(0, fstride))
        # noise-like, NOT a pure tone: CMVN on a constant-spectrum signal
        # divides by a near-zero per-dim variance, which amplifies
        # last-ulp matmul-tiling differences between padded widths into
        # O(1) sign flips — a degenerate input, not a pipeline property
        signals.append(
            (0.1 * rng.standard_normal(S)).astype(np.float32))
        tokens.append(np.asarray(tok.encode("AB CD", with_eos=True),
                                 np.int32))
    return signals, tokens


def test_audio_vs_feature_shards_equivalence(tmp_path, rng):
    """Same corpus through both pipelines: identical bucket membership
    and frame counts, matching feature values, matching train-step loss."""
    cfg_feat = Config(**TINY)
    cfg_audio = cfg_feat.replace(audio_shards=True)
    signals, tokens = _make_corpus(rng)

    os.makedirs(tmp_path / "feat")
    os.makedirs(tmp_path / "audio")
    feats = frontend.extract_features_list(signals, cfg_feat)
    shards.create_shards(feats, tokens, str(tmp_path / "feat" / "dev"),
                         records_per_shard=100, shuffle=False)
    sigs3 = [s.reshape(-1, 1, 1) for s in signals]
    shards.create_shards(sigs3, tokens, str(tmp_path / "audio" / "dev"),
                         records_per_shard=100, shuffle=False)

    lf = BucketedLoader(sorted(glob.glob(str(tmp_path / "feat" / "dev*"))),
                        cfg_feat, is_training=False)
    la = BucketedLoader(sorted(glob.glob(str(tmp_path / "audio" / "dev*"))),
                        cfg_audio, is_training=False)
    batches_f, batches_a = list(lf), list(la)
    assert len(batches_f) == len(batches_a) >= 2  # both buckets hit

    # train_step donates its state: feed each call a fresh device copy
    host_ts = jax.device_get(
        trainer.create_train_state(jax.random.PRNGKey(0), cfg_feat))
    fresh = lambda: jax.tree_util.tree_map(jnp.asarray, host_ts)
    for bf, ba in zip(batches_f, batches_a):
        # bucket membership and batch composition match one for one
        assert bf[0].shape[0] == ba[0].shape[0]
        np.testing.assert_array_equal(bf[2], ba[2])
        # in-step featurization reproduces the preprocess features
        feat_a, featlen_a = frontend.featurize_batch(
            jnp.asarray(ba[0]), jnp.asarray(ba[1]), cfg_audio)
        assert feat_a.shape == bf[0].shape  # padded to the same frames
        np.testing.assert_array_equal(np.asarray(featlen_a), bf[1])
        np.testing.assert_allclose(np.asarray(feat_a), bf[0],
                                   rtol=1e-4, atol=1e-4)
        # one optimization step from the same state: same loss
        dec = bf[2].shape[1]
        _, mf = trainer.train_step(fresh(), tuple(bf), cfg_feat,
                                   dec_steps=dec)
        _, ma = trainer.train_step(fresh(), tuple(ba), cfg_audio,
                                   dec_steps=dec)
        np.testing.assert_allclose(float(ma["loss"]), float(mf["loss"]),
                                   rtol=1e-4)


def test_audio_shards_multi_step_and_mesh(tmp_path, rng):
    """The adapter covers every step flavor: K-step scan dispatch and the
    SPMD mesh step both train from waveform batches."""
    # batch of 8: divisible by the 8-device virtual mesh's data axis
    cfg = Config(**TINY).replace(audio_shards=True,
                                 bucket_batch_sizes=(8, 8))
    signals, tokens = _make_corpus(rng, lo=24, hi=47)  # one full bucket
    sigs3 = [s.reshape(-1, 1, 1) for s in signals]
    shards.create_shards(sigs3, tokens, str(tmp_path / "dev"),
                         records_per_shard=100, shuffle=False)
    loader = BucketedLoader(sorted(glob.glob(str(tmp_path / "dev*"))),
                            cfg, is_training=False)
    batch = next(iter(loader))

    host_ts = jax.device_get(
        trainer.create_train_state(jax.random.PRNGKey(0), cfg))
    fresh = lambda: jax.tree_util.tree_map(jnp.asarray, host_ts)
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), tuple(batch), tuple(batch))
    ts2, m = trainer.train_multi_step(fresh(), stacked, cfg,
                                      dec_steps=batch[2].shape[1])
    assert np.isfinite(np.asarray(m["loss"])).all()

    from automatic_speech_recognition_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(num_partitions=1)
    step_fn, ts_sh, shard_batch = trainer.make_mesh_train_step(
        mesh, fresh(), tuple(batch), cfg)
    _, m = step_fn(ts_sh, shard_batch(tuple(batch)))
    assert np.isfinite(float(m["loss"]))

    # the full fused pipeline — lax.switch over dilated-conv resamplers +
    # frontend + fwd+bwd — must also partition over the mesh
    cfg_osp = cfg.replace(online_speed_perturb=True)
    step_fn, ts_sh, shard_batch = trainer.make_mesh_train_step(
        mesh, fresh(), tuple(batch), cfg_osp)
    _, m = step_fn(ts_sh, shard_batch(tuple(batch)))
    assert np.isfinite(float(m["loss"]))


def test_audio_shards_cli_pipeline(tmp_path, rng, monkeypatch):
    """Full CLI path with --audio_shards True: preprocess (raw dumps) ->
    create_shards -> train 1 epoch -> test.py WER -> decode.py beam."""
    import preprocess as pre_cli
    import create_shards as cs_cli
    import train as train_cli
    import test as test_cli
    import decode as decode_cli

    root = str(tmp_path)
    words = ["HELLO", "WORLD", "LISTEN", "SPELL"]
    dd = f"{root}/corpus/train/1/10"
    os.makedirs(dd)
    lines = []
    for u in range(8):
        uid = f"1-10-{u:04d}"
        lines.append(f"{uid} {' '.join(rng.choice(words, 2))}")
        write_wav(f"{dd}/{uid}.wav",
                  rng.standard_normal(int(16000 * 0.7)) * 0.1, 16000)
    with open(f"{dd}/1-10.trans.txt", "w") as f:
        f.write("\n".join(lines))
    import shutil
    shutil.copytree(f"{root}/corpus/train", f"{root}/corpus/dev")

    flags = ["--unit", "char", "--feat_dim", "8", "--audio_shards", "True",
             "--train_100hr_corpus_dir", f"{root}/corpus/train",
             "--train_360hr_corpus_dir", f"{root}/no360",
             "--train_500hr_corpus_dir", f"{root}/no500",
             "--dev_data_dir", f"{root}/corpus/dev",
             "--test_data_dir", f"{root}/notest",
             "--feat_dir", f"{root}/feats", "--shard_dir", f"{root}/shards",
             "--save_dir", f"{root}/model", "--log_dir", f"{root}/log",
             "--summary_dir", f"{root}/sum",
             "--enc_units", "16", "--num_enc_channels", "4",
             "--num_enc_layers", "1", "--dec_units", "16",
             "--num_dec_layers", "1", "--embedding_size", "8",
             "--attention_size", "8", "--mode", "add",
             "--dropout_rate", "0.0", "--scheduled_sampling", "False",
             "--epoch", "1", "--steps_per_epoch", "3",
             "--bucket_boundaries_train", "72,96",
             "--bucket_boundaries_eval", "72,96",
             "--bucket_batch_sizes", "8,8",
             "--max_tokenlen_train", "14", "--max_tokenlen_eval", "14"]
    pre_cli.main(flags)
    # the dumps are raw waveforms, not features
    dump = np.load(f"{root}/feats/train-100-feats.npy", allow_pickle=True)
    assert dump[0].shape[1:] == (1, 1)
    cs_cli.main(flags)
    train_cli.main(flags)
    wer = test_cli.main(flags + ["--split", "dev", "--convert_rate", "0.3"])
    assert np.isfinite(wer) and wer >= 0.0
    decode_cli.main(flags + ["--split", "dev", "--convert_rate", "0.3",
                             "--beam_size", "2", "--beam_logprob", "True",
                             "--restore_epoch", "-1"])
    assert os.path.exists(f"{root}/log/decode_pred.txt")


def test_device_resampler_matches_host():
    """ops/augmentation.resample_rational_device: the dilated-strided
    convolution reproduces the host upfirdn polyphase path sample for
    sample, for both an upsampling (0.9) and a downsampling (1.1) rate."""
    from automatic_speech_recognition_tpu.ops import augmentation as aug

    rng = np.random.default_rng(3)
    S_pad = 4000
    lens = [3200, 2777]
    sig = np.zeros((2, S_pad), np.float32)
    for i, n in enumerate(lens):
        sig[i, :n] = 0.3 * rng.standard_normal(n).astype(np.float32)

    for speed in (0.9, 1.1):
        frac = aug._rational_speed(speed)
        down, up = frac.numerator, frac.denominator
        out, new_len = aug.resample_rational_device(
            jnp.asarray(sig), jnp.asarray(lens, np.int32), up, down)
        out = np.asarray(out)
        for i, n in enumerate(lens):
            n_out = (n * up) // down
            assert int(new_len[i]) == n_out
            # host path pads the signal tail itself; the device path's
            # padded buffer zeros are the same samples
            ref = aug._resample_sinc(sig[i, :n], up, down, n_out)
            np.testing.assert_allclose(out[i, :n_out], ref,
                                       rtol=2e-4, atol=2e-5)
            assert not out[i, n_out:].any()  # masked beyond the new length


def test_online_speed_perturb_batch_switch():
    """online_speed_perturb picks ONE configured rate per batch; every
    rate in the list is reachable and the output matches that rate's
    direct resample (rate 1.0 = identity)."""
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.ops import augmentation as aug

    rng = np.random.default_rng(5)
    S_pad = 3000
    sig = (0.2 * rng.standard_normal((2, S_pad))).astype(np.float32)
    siglen = np.asarray([2500, 2000], np.int32)
    cfg = Config(unit="char", vocab_size=30, audio_shards=True,
                 online_speed_perturb=True)

    per_rate = {}
    for r in (0.9, 1.0, 1.1):
        frac = aug._rational_speed(r)
        out, nl = aug.resample_rational_device(
            jnp.asarray(sig), jnp.asarray(siglen),
            frac.denominator, frac.numerator)
        per_rate[r] = (np.asarray(out), np.asarray(nl))
    np.testing.assert_array_equal(per_rate[1.0][0], sig)  # identity

    seen = set()
    for k in range(12):
        out, nl = aug.online_speed_perturb(
            jax.random.PRNGKey(k), jnp.asarray(sig), jnp.asarray(siglen),
            cfg)
        out, nl = np.asarray(out), np.asarray(nl)
        hits = [r for r, (o, n) in per_rate.items()
                if np.array_equal(nl, n) and np.allclose(out, o, atol=1e-5)]
        assert len(hits) == 1, "batch must match exactly one rate"
        seen.add(hits[0])
    assert seen == {0.9, 1.0, 1.1}  # all rates reachable


def test_online_speed_bucketing_and_training(tmp_path, rng):
    """The loader buckets by the slowest rate's output length (a record
    near a boundary moves up a bucket) and a train step on the stretched
    batch is finite at every rate branch."""
    from automatic_speech_recognition_tpu.ops.augmentation import (
        worst_stretch_len)

    flen, fstride = frame_params(16000, 25, 10)
    cfg = Config(**TINY).replace(audio_shards=True,
                                 online_speed_perturb=True)
    # 46 frames: fits bucket 0 (<48) raw, but stretched by 1/0.9 it
    # crosses into bucket 1
    S = flen + 46 * fstride
    assert worst_stretch_len(S, "0.9,1.0,1.1") > 48 * fstride + flen
    tok = CharEncoder()
    sigs = [(0.1 * rng.standard_normal(S)).astype(np.float32)
            .reshape(-1, 1, 1) for _ in range(4)]
    tokens = [np.asarray(tok.encode("AB", with_eos=True), np.int32)] * 4
    shards.create_shards(sigs, tokens, str(tmp_path / "train"),
                         records_per_shard=100, shuffle=False)
    files = sorted(glob.glob(str(tmp_path / "train*")))

    cfg_train = cfg.replace(bucket_boundaries_train=(48, 64),
                            bucket_batch_sizes=(4, 4), max_tokenlen_train=8)
    loader = BucketedLoader(files, cfg_train, is_training=True, seed=0)
    batch = next(iter(loader))
    # bucketed UP: padded to boundary 64's sample width, not bucket 0's
    assert batch[0].shape[1] == 64 * fstride + flen

    host_ts = jax.device_get(
        trainer.create_train_state(jax.random.PRNGKey(0), cfg_train))
    for k in range(6):  # several batch coins: every branch must be finite
        ts = jax.tree_util.tree_map(jnp.asarray, host_ts)
        ts = ts._replace(rng=jax.random.PRNGKey(k))
        _, m = trainer.train_step(ts, tuple(batch), cfg_train,
                                  dec_steps=batch[2].shape[1])
        assert np.isfinite(float(m["loss"]))

    # eval loaders ignore the stretch (no augmentation at eval)
    loader_ev = BucketedLoader(files, cfg_train.replace(
        bucket_boundaries_eval=(48, 64), max_tokenlen_eval=8),
        is_training=False)
    ev = next(iter(loader_ev))
    assert ev[0].shape[1] == 48 * fstride + flen


def test_online_volume_perturb():
    """Per-utterance gains within bounds, clipping honored, train step
    wiring finite; and the misconfiguration is rejected."""
    from automatic_speech_recognition_tpu.ops import augmentation as aug

    rng = np.random.default_rng(7)
    sig = (0.9 * rng.standard_normal((4, 1000))).astype(np.float32)
    cfg = Config(**TINY).replace(audio_shards=True,
                                 online_volume_perturb=True,
                                 online_volume_low=0.5,
                                 online_volume_high=2.0)
    out = np.asarray(aug.online_volume_perturb(
        jax.random.PRNGKey(0), jnp.asarray(sig), cfg))
    assert np.abs(out).max() <= 1.0  # clipped
    # recover per-utterance gains from unclipped samples: constant per row
    for i in range(4):
        unclipped = np.abs(out[i]) < 0.999
        small = np.abs(sig[i]) > 1e-3
        ratios = out[i][unclipped & small] / sig[i][unclipped & small]
        assert ratios.std() < 1e-5
        assert 0.5 <= ratios.mean() <= 2.0
    gains = []
    for i in range(4):
        m = (np.abs(out[i]) < 0.999) & (np.abs(sig[i]) > 1e-3)
        gains.append(float((out[i][m] / sig[i][m]).mean()))
    assert np.std(gains) > 1e-3  # gains vary ACROSS utterances

    with pytest.raises(ValueError, match="low"):
        aug.online_volume_perturb(
            jax.random.PRNGKey(0), jnp.asarray(sig),
            cfg.replace(online_volume_low=0.0))

    # wiring: one train step from waveforms with volume perturb on
    flen, fstride = frame_params(16000, 25, 10)
    S = flen + 30 * fstride
    batch = (jnp.asarray(0.1 * rng.standard_normal((4, S, 1, 1)),
                         jnp.float32),
             jnp.full((4,), S, jnp.int32),
             jnp.asarray(rng.integers(3, 29, (4, 6)), jnp.int32),
             jnp.full((4,), 6, jnp.int32))
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    _, m = trainer.train_step(ts, batch, cfg, dec_steps=6)
    assert np.isfinite(float(m["loss"]))


def test_online_noise_perturb():
    """Achieved per-utterance SNR matches the drawn range, padding stays
    zero, silent rows stay silent, pink noise has a falling spectrum, and
    the train-step wiring is finite."""
    from automatic_speech_recognition_tpu.ops import augmentation as aug

    rng = np.random.default_rng(11)
    B, S = 4, 16000
    sig = (0.2 * rng.standard_normal((B, S))).astype(np.float32)
    siglen = np.array([16000, 12000, 9000, 16000], np.int32)
    for i in range(B):
        sig[i, siglen[i]:] = 0.0
    sig[2, :] = 0.0  # silent utterance
    cfg = Config(**TINY).replace(audio_shards=True,
                                 online_noise_perturb=True,
                                 online_noise_snr_low=10.0,
                                 online_noise_snr_high=10.0)
    out = np.asarray(aug.online_noise_perturb(
        jax.random.PRNGKey(3), jnp.asarray(sig), jnp.asarray(siglen), cfg))
    assert out.shape == sig.shape
    for i in (0, 1, 3):
        v = slice(0, siglen[i])
        p_sig = np.mean(sig[i, v] ** 2)
        p_noise = np.mean((out[i, v] - sig[i, v]) ** 2)
        snr_db = 10 * np.log10(p_sig / p_noise)
        assert abs(snr_db - 10.0) < 0.3, snr_db  # exact up to clipping
        assert np.all(out[i, siglen[i]:] == 0.0)  # padding untouched
    assert np.all(out[2] == 0.0)  # no noise added to silence
    assert np.abs(out).max() <= 1.0

    # pink: low-frequency band carries more added-noise energy than high
    cfg_pink = cfg.replace(online_noise_kind="pink")
    outp = np.asarray(aug.online_noise_perturb(
        jax.random.PRNGKey(3), jnp.asarray(sig), jnp.asarray(siglen),
        cfg_pink))
    spec = np.abs(np.fft.rfft(outp[0] - sig[0])) ** 2
    half = len(spec) // 2
    assert spec[1:half].sum() > 4 * spec[half:].sum()

    # online_noise_p: per-utterance coin.  p=0 is an exact passthrough;
    # p=0.5 leaves some rows bit-identical and noises the rest at the
    # drawn SNR (mixed-condition training, benchmarks/WER_SYNTH.md).
    out0 = np.asarray(aug.online_noise_perturb(
        jax.random.PRNGKey(3), jnp.asarray(sig), jnp.asarray(siglen),
        cfg.replace(online_noise_p=0.0)))
    assert np.array_equal(out0, sig)
    Bm, key = 64, jax.random.PRNGKey(7)
    sig_m = (0.2 * rng.standard_normal((Bm, 800))).astype(np.float32)
    len_m = np.full((Bm,), 800, np.int32)
    out_m = np.asarray(aug.online_noise_perturb(
        key, jnp.asarray(sig_m), jnp.asarray(len_m),
        cfg.replace(online_noise_p=0.5)))
    clean_rows = int(sum(np.array_equal(out_m[i], sig_m[i])
                         for i in range(Bm)))
    assert 16 <= clean_rows <= 48, clean_rows  # binomial(64, .5), ±4σ
    noised = next(i for i in range(Bm)
                  if not np.array_equal(out_m[i], sig_m[i]))
    p_noise = np.mean((out_m[noised] - sig_m[noised]) ** 2)
    snr_db = 10 * np.log10(np.mean(sig_m[noised] ** 2) / p_noise)
    assert abs(snr_db - 10.0) < 0.3, snr_db
    with pytest.raises(ValueError, match="online_noise_p"):
        aug.online_noise_perturb(
            jax.random.PRNGKey(0), jnp.asarray(sig), jnp.asarray(siglen),
            cfg.replace(online_noise_p=1.5))

    with pytest.raises(ValueError, match="snr_low"):
        aug.online_noise_perturb(
            jax.random.PRNGKey(0), jnp.asarray(sig), jnp.asarray(siglen),
            cfg.replace(online_noise_snr_low=20.0,
                        online_noise_snr_high=5.0))
    with pytest.raises(ValueError, match="kind"):
        aug.online_noise_perturb(
            jax.random.PRNGKey(0), jnp.asarray(sig), jnp.asarray(siglen),
            cfg.replace(online_noise_kind="brown"))

    # wiring: one train step from waveforms with noise perturb on
    flen, fstride = frame_params(16000, 25, 10)
    S2 = flen + 30 * fstride
    batch = (jnp.asarray(0.1 * rng.standard_normal((4, S2, 1, 1)),
                         jnp.float32),
             jnp.full((4,), S2, jnp.int32),
             jnp.asarray(rng.integers(3, 29, (4, 6)), jnp.int32),
             jnp.full((4,), 6, jnp.int32))
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    _, m = trainer.train_step(ts, batch, cfg, dec_steps=6)
    assert np.isfinite(float(m["loss"]))


def test_corpus_degrader(tmp_path):
    """ops/augmentation.make_degrader: SNR within the band, reverb smears
    energy, peak normalization respected; and the degrade_corpus tool
    renders a paired LibriSpeech-layout copy."""
    from automatic_speech_recognition_tpu.ops.augmentation import (
        make_degrader)

    rng = np.random.default_rng(5)
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
           ).astype(np.float64)
    deg = make_degrader("15,15", "white", reverb_p=0.0)
    out = deg(sig.copy(), rng)
    snr = 10 * np.log10(np.mean(sig ** 2) / np.mean((out - sig) ** 2))
    assert abs(snr - 15.0) < 0.5, snr
    assert np.abs(out).max() <= 0.99 + 1e-9

    # reverb: a click grows a decaying tail
    click = np.zeros(8000)
    click[100] = 0.9
    degr = make_degrader("", "white", reverb_p=1.0)
    outr = degr(click.copy(), np.random.default_rng(1))
    assert np.sum(outr[200:] ** 2) > 1e-4  # energy smeared past the click
    assert make_degrader("", "white", 0.0) is None
    with pytest.raises(ValueError, match="low > high"):
        make_degrader("20,5", "white", 0.0)

    # tool round trip on a fabricated 2-utterance corpus
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "degrade_corpus", os.path.join(os.path.dirname(__file__), "..",
                                       "tools", "degrade_corpus.py"))
    dc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dc)
    from automatic_speech_recognition_tpu.data.flac import read_flac
    from automatic_speech_recognition_tpu.data.flac_encode import encode_flac

    src = tmp_path / "clean" / "dev" / "7" / "1"
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for i in range(2):
        pcm = np.clip(np.round(
            0.2 * rng.standard_normal(8000) * 32767), -32768,
            32767).astype(np.int32)
        with open(src / f"7-1-{i:04d}.flac", "wb") as f:
            f.write(encode_flac([pcm], sample_rate=16000, blocksize=4096,
                                subframe_kind="verbatim"))
    with open(src / "7-1.trans.txt", "w") as f:
        f.write("7-1-0000 HELLO THERE\n7-1-0001 GOOD DAY\n")

    dc.main(["--in_dir", str(tmp_path / "clean"),
             "--out_dir", str(tmp_path / "noisy"),
             "--noise_snr", "10,10", "--noise_kind", "white"])
    dst = tmp_path / "noisy" / "dev" / "7" / "1"
    assert (dst / "7-1.trans.txt").read_text().startswith("7-1-0000 HELLO")
    a, _ = read_flac(str(src / "7-1-0000.flac"))
    b, _ = read_flac(str(dst / "7-1-0000.flac"))
    assert len(a) == len(b)
    got = 10 * np.log10(np.mean(a ** 2) / np.mean((b - a) ** 2))
    # 16-bit re-quantization of the noisy sum perturbs the measured SNR a
    # touch; the drawn SNR itself is exact (see the direct check above)
    assert abs(got - 10.0) < 1.0, got


def test_use_saved_config_propagates_audio_shards(tmp_path):
    """audio_shards is a MODEL_FIELDS member: --use_saved_config eval of
    an audio-shards model must read waveform shards (a stale False would
    silently drop every record as over-length)."""
    from automatic_speech_recognition_tpu.config import (
        apply_saved_model_config, check_model_config, save_config_snapshot)

    cfg_train = Config(**TINY).replace(audio_shards=True, vocab_size=0)
    save_config_snapshot(cfg_train, str(tmp_path))
    cfg_eval = Config(**TINY).replace(vocab_size=0)  # user forgot the flag
    assert any("audio_shards" in m
               for m in check_model_config(cfg_eval, str(tmp_path)))
    fixed, overridden = apply_saved_model_config(cfg_eval, str(tmp_path))
    assert fixed.audio_shards is True
    assert any("audio_shards" in line for line in overridden)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(up=st.integers(1, 12), down=st.integers(1, 12),
       n=st.integers(300, 1500), seed=st.integers(0, 2**31 - 1))
def test_device_resampler_matches_host_property(up, down, n, seed):
    """Arbitrary rational rates, arbitrary lengths: device == host."""
    from automatic_speech_recognition_tpu.ops import augmentation as aug

    if up == down:
        return
    rng = np.random.default_rng(seed)
    S_pad = max(n + 64, (n * up) // down + 64)
    sig = np.zeros((1, S_pad), np.float32)
    sig[0, :n] = (0.3 * rng.standard_normal(n)).astype(np.float32)
    out, new_len = aug.resample_rational_device(
        jnp.asarray(sig), jnp.asarray([n], np.int32), up, down)
    n_out = (n * up) // down
    assert int(new_len[0]) == n_out
    ref = aug._resample_sinc(sig[0, :n], up, down, n_out)
    np.testing.assert_allclose(np.asarray(out)[0, :n_out], ref,
                               rtol=3e-4, atol=3e-5)


@settings(max_examples=200, deadline=None)
@given(frames=st.integers(0, 4000), samples=st.integers(0, 700000),
       boundary=st.integers(1, 2000))
def test_frame_sample_boundary_conversion_exact(frames, samples, boundary):
    """The pipeline's sample-space conversion preserves bucket membership
    EXACTLY: frames(samples) < b  <=>  samples < b*fstride + flen."""
    flen, fstride = frame_params(16000, 25, 10)
    n_frames = max((samples - flen) // fstride, 0)
    assert (n_frames < boundary) == (samples < boundary * fstride + flen) \
        or samples < flen  # degenerate sub-frame signals: frames == 0
    # and padding to the converted boundary featurizes to EXACTLY b frames
    padded = boundary * fstride + flen
    assert (padded - flen) // fstride == boundary
