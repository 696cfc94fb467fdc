"""Frontend parity: batched JAX frontend vs the NumPy speechpy-semantics
reference, plus unit checks of each speechpy convention."""

import numpy as np
import pytest
from scipy.fft import dct as scipy_dct

from automatic_speech_recognition_tpu.ops import frontend, frontend_host as host


def _speech(rng, seconds, fs=16000):
    """Synthetic speech-like signal: sum of AM tones + noise."""
    t = np.arange(int(seconds * fs)) / fs
    sig = (0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
           + 0.2 * np.sin(2 * np.pi * 1200 * t)
           + 0.05 * rng.standard_normal(len(t)))
    return sig.astype(np.float64)


def test_frame_counts_match_speechpy_floor():
    flen, fstride = host.frame_params(16000, 25, 10)
    assert (flen, fstride) == (400, 160)
    # floor((L - 400)/160), no +1 (speechpy zero_padding=False)
    assert host.num_frames(400, flen, fstride) == 0
    assert host.num_frames(560, flen, fstride) == 1
    assert host.num_frames(561, flen, fstride) == 1
    assert host.num_frames(16000, flen, fstride) == 97


def test_dct_matrix_matches_scipy():
    x = np.random.default_rng(1).standard_normal((7, 40))
    want = scipy_dct(x, type=2, axis=-1, norm="ortho")[:, :13]
    got = x @ host.dct_matrix(40, 13)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_filterbank_quirk_upper_bins_empty():
    fb = host.mel_filterbank(40, 257, 16000)
    # the (coefficients+1) quirk puts the top filter edge at
    # floor(258 * 8000 / 16000) = 129 -> bins above 129 are all zero
    assert fb.shape == (40, 257)
    assert fb[:, 130:].sum() == 0.0
    assert fb[:, :130].sum() > 0.0


def test_derivative_feature_axis_quirk():
    x = np.arange(12, dtype=np.float64).reshape(3, 4)
    d = host.derivative_extraction(x, 2)
    # manual: edge pad cols -> [x0,x0,x0,x1,x2,x3,x3,x3]
    # j=0: 1*x1 - x0 + 2*x2 - x0; j=1: 1*x2 - x0 + 2*x3 - x0
    # j=2: 1*x3 - x1 + 2*x3 - x0; j=3: 1*x3 - x2 + 2*x3 - x1   all /10
    row = x[0]
    want0 = (row[1] - row[0] + 2 * row[2] - row[0]) / 10
    want3 = (row[3] - row[2] + 2 * row[3] - row[1]) / 10
    assert d[0, 0] == pytest.approx(want0)
    assert d[0, 3] == pytest.approx(want3)


def test_cmvn_matches_definition():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 13)) * 3 + 1
    out = host.cmvn(x, True)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-12)
    np.testing.assert_allclose(out.std(0), 1, atol=1e-6)


@pytest.mark.parametrize("feat_type,feat_dim", [("mfcc", 13), ("fbank", 40)])
def test_jax_frontend_matches_host(rng, feat_type, feat_dim):
    fs = 16000
    lens = [1.0, 1.37, 2.0]
    sigs = [_speech(rng, s, fs) for s in lens]
    S = max(len(s) for s in sigs)
    audio = np.zeros((len(sigs), S), np.float32)
    for i, s in enumerate(sigs):
        audio[i, :len(s)] = s
    audiolen = np.array([len(s) for s in sigs], np.int32)

    feats, featlen = frontend.extract_features(
        audio, audiolen, feat_dim=feat_dim, feat_type=feat_type)
    feats, featlen = np.asarray(feats), np.asarray(featlen)

    for i, s in enumerate(sigs):
        want = host.process_audio(s, fs, 25, 10, feat_dim, feat_type, True)
        T = want.shape[0]
        assert featlen[i] == T
        got = feats[i, :T]
        # float32 on-device vs float64 host; CMVN'd features are O(1)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
        # padded region zeroed
        assert np.all(feats[i, T:] == 0)


def test_jax_frontend_fft_and_matmul_paths_agree(rng):
    sig = _speech(rng, 1.0)
    audio = sig[None, :].astype(np.float32)
    alen = np.array([len(sig)], np.int32)
    a, _ = frontend.extract_features(audio, alen, use_fft=False)
    b, _ = frontend.extract_features(audio, alen, use_fft=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_no_cmvn_skips_deltas(rng):
    """Reference quirk: deltas only when cmvn=True (preprocess.py:84-87)."""
    sig = _speech(rng, 1.0)
    out = host.process_audio(sig, apply_cmvn=False)
    assert out.ndim == 2
    feats, _ = frontend.extract_features(
        sig[None].astype(np.float32), np.array([len(sig)], np.int32),
        apply_cmvn=False)
    assert feats.ndim == 3


def test_mfcc_c0_is_log_energy(rng):
    sig = _speech(rng, 1.0)
    feat = host.mfcc(sig, 16000, 25, 10, 13)
    flen, fstride = host.frame_params(16000, 25, 10)
    frames = host.stack_frames(sig, flen, fstride)
    ps = host.power_spectrum(frames, 512)
    np.testing.assert_allclose(feat[:, 0], np.log(ps.sum(1)), rtol=1e-10)
