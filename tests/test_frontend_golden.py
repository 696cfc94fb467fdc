"""Grounding the frontend in speechpy itself (VERDICT round 1, item 2).

Three independent anchors, so the production golden
(ops/frontend_host.py) is no longer validated only against itself:

1. tests/speechpy_reference.py — a faithful test-only transcription of
   speechpy's upstream source (same decomposition/idioms/names).  Every
   stage and the full composed pipeline of frontend_host must agree with
   it bit-close on REAL recorded audio (tests/fixtures/pluck-pcm16.wav,
   a CPython-test-suite recording of a real guitar pluck) and on
   adversarial synthetic edges (exact frame divisibility, sub-frame
   signals).
2. Hand-derived analytic fixtures — tiny cases whose expected values are
   computed by hand in this file (framing counts, the derivative quirk,
   CMVN, filterbank support), independent of BOTH implementations, plus
   the DCT checked directly against scipy.fftpack.dct — the very call
   speechpy makes.
3. A committed golden array (tests/fixtures/pluck_mfcc_golden.npz),
   generated once from the speechpy transcription on the real clip, so
   any future numerical drift fails loudly.

The on-TPU frontend (ops/frontend.py) is then held to the host golden on
the same real audio.  Reference consumption point: preprocess.py:72-87.
"""

import os
import wave

import numpy as np
import pytest

from automatic_speech_recognition_tpu.ops import frontend, frontend_host as host
import speechpy_reference as spy

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def load_pluck() -> np.ndarray:
    """Real recorded audio: stereo 16-bit 11025 Hz -> mono float64 in
    [-1, 1) exactly as soundfile.read scales PCM16 (reference
    preprocess.py:69)."""
    with wave.open(os.path.join(FIXDIR, "pluck-pcm16.wav")) as w:
        raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        sig = raw.reshape(-1, w.getnchannels()).mean(axis=1) / 32768.0
    return sig


@pytest.fixture(scope="module")
def pluck():
    return load_pluck()


@pytest.fixture(scope="module")
def pluck16k(pluck):
    """The clip resampled to the corpus rate through the sinc resampler."""
    from automatic_speech_recognition_tpu.ops.augmentation import (
        speed_perturb)
    # 11025 -> 16000: 'speed' of 11025/16000 keeps pitch, changes rate
    return speed_perturb(pluck, 11025.0 / 16000.0)


# ---------------------------------------------------------------------------
# 1. frontend_host vs the speechpy transcription
# ---------------------------------------------------------------------------

def test_host_matches_speechpy_on_real_audio(pluck):
    fs = 11025
    want = spy.mfcc(pluck, fs, frame_length=0.025, frame_stride=0.01,
                    num_cepstral=13)
    got = host.mfcc(pluck, fs, 25, 10, num_cepstral=13)
    assert want.shape == got.shape and want.shape[0] > 20
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_host_matches_speechpy_fbank_on_real_audio(pluck16k):
    want, energies = spy.mfe(pluck16k, 16000, frame_length=0.025,
                             frame_stride=0.01, num_filters=40)
    got, got_energies = host.mfe(pluck16k, 16000, 25, 10, num_filters=40)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    np.testing.assert_allclose(got_energies, energies, rtol=1e-10)


def test_host_full_pipeline_matches_speechpy_composition(pluck16k):
    """process_audio == the exact composition the reference runs
    (preprocess.py:72-87): mfcc -> cmvn(variance) -> derivative cube."""
    feat = spy.mfcc(pluck16k, 16000, frame_length=0.025, frame_stride=0.01,
                    num_cepstral=13)
    feat = spy.cmvn(feat, variance_normalization=True)
    want = spy.extract_derivative_feature(feat)
    got = host.process_audio(pluck16k, 16000, 25, 10, 13, "mfcc", True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n_samples", [400, 401, 560, 720, 721, 7777])
def test_host_framing_matches_speechpy_edges(rng, n_samples):
    """Edge lengths around exact frame/stride divisibility (fs 16k:
    flen=400, stride=160), where floor-vs-ceil conventions diverge.
    (Below flen upstream speechpy computes numframes=-1 and crashes in
    np.tile; the host golden returns 0 frames instead — covered by
    test_framing_counts_by_hand.)"""
    sig = rng.standard_normal(n_samples)
    want = spy.stack_frames(sig, 16000, 0.025, 0.01, zero_padding=False)
    got = host.stack_frames(sig, *host.frame_params(16000, 25, 10))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_host_cmvn_and_derivative_match_speechpy(rng):
    x = rng.standard_normal((30, 13)) * 4 + 2
    np.testing.assert_allclose(host.cmvn(x, True), spy.cmvn(x, True),
                               rtol=1e-12)
    np.testing.assert_allclose(host.derivative_extraction(x, 2),
                               spy.derivative_extraction(x, 2), rtol=1e-12)
    np.testing.assert_allclose(host.extract_derivative_feature(x),
                               spy.extract_derivative_feature(x), rtol=1e-12)


def test_host_filterbank_matches_speechpy():
    fb_h = host.mel_filterbank(40, 257, 16000, 0, 8000)
    fb_s = spy.filterbanks(40, 257, 16000, 0, 8000)
    np.testing.assert_allclose(fb_h, fb_s, rtol=1e-12)


# ---------------------------------------------------------------------------
# 2. Hand-derived analytic fixtures (independent of both implementations)
# ---------------------------------------------------------------------------

def test_framing_counts_by_hand():
    """floor((L - flen)/stride): fs=16k, 25ms/10ms -> flen=400, stride=160.
    L=400 -> 0 frames (speechpy's zero_padding=False quirk: one full frame
    fits but floor((0)/160)=0); L=719 -> 1; L=720 -> 2 (exact boundary)."""
    flen, fstride = host.frame_params(16000, 25, 10)
    assert (flen, fstride) == (400, 160)
    assert host.num_frames(400, flen, fstride) == 0
    assert host.num_frames(719, flen, fstride) == 1
    assert host.num_frames(720, flen, fstride) == 2
    assert host.num_frames(399, flen, fstride) == 0


def test_derivative_quirk_by_hand():
    """One row [1, 2, 4], edge-padded to [1,1,1,2,4,4,4]:
    Range 1: 1*[2,4,4] - [1,1,2] = [1,3,2]
    Range 2: 2*[4,4,4] - [1,1,1] = [7,7,7]
    sum/Scale(2*1^2+2*2^2=10) = [0.8, 1.0, 0.9]."""
    out = host.derivative_extraction(np.array([[1.0, 2.0, 4.0]]), 2)
    np.testing.assert_allclose(out, [[0.8, 1.0, 0.9]], rtol=1e-15)


def test_cmvn_by_hand():
    """[[1,10],[3,20]]: means (2,15); centered [[-1,-5],[1,5]];
    std (1,5) -> variance-normalized [[-1,-1],[1,1]] (up to eps 2^-30)."""
    x = np.array([[1.0, 10.0], [3.0, 20.0]])
    np.testing.assert_allclose(host.cmvn(x, False), [[-1, -5], [1, 5]])
    np.testing.assert_allclose(host.cmvn(x, True), [[-1, -1], [1, 1]],
                               rtol=1e-8)


def test_dct_matches_scipy_fftpack():
    """speechpy literally calls scipy.fftpack.dct(type=2, norm='ortho');
    the host golden's explicit matrix must reproduce that call."""
    from scipy.fftpack import dct
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 40))
    want = dct(x, type=2, axis=-1, norm="ortho")[:, :13]
    got = x @ host.dct_matrix(40, 13)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_filterbank_quirk_occupies_lower_half():
    """The (coefficients+1) index quirk: with a 512 FFT (257 coefficients)
    at fs 16k, the topmost filter edge lands at floor(258*8000/16000)=129,
    so bins above 129 are never touched — filters occupy only the lower
    half of the spectrum."""
    fb = host.mel_filterbank(40, 257, 16000, 0, 8000)
    assert fb[:, 130:].sum() == 0.0
    assert fb[:, :130].sum() > 0.0
    # each filter is a unit-peak triangle
    assert np.allclose(fb.max(axis=1), 1.0)


# ---------------------------------------------------------------------------
# 3. Committed golden arrays from the real clip
# ---------------------------------------------------------------------------

def test_pinned_golden_on_real_audio(pluck, pluck16k):
    """Any numerical drift in the host golden (or the fixture wav) fails
    against the committed arrays (generated from the speechpy
    transcription; see tests/fixtures/README.md)."""
    g = np.load(os.path.join(FIXDIR, "pluck_mfcc_golden.npz"))
    got_native = host.mfcc(pluck, 11025, 25, 10, num_cepstral=13)
    np.testing.assert_allclose(got_native, g["mfcc_11025"], rtol=1e-10,
                               atol=1e-12)
    got_proc = host.process_audio(pluck16k, 16000, 25, 10, 13, "mfcc", True)
    np.testing.assert_allclose(got_proc, g["cube_16000"], rtol=2e-5,
                               atol=2e-6)


def test_tpu_frontend_matches_host_on_real_audio(pluck16k):
    """The on-device frontend reproduces the host golden on real recorded
    audio, not just synthetic tones."""
    sig = pluck16k.astype(np.float32)
    audio = sig[None, :]
    alen = np.array([len(sig)], np.int32)
    feats, featlen = frontend.extract_features(audio, alen, feat_dim=13,
                                               feat_type="mfcc")
    want = host.process_audio(pluck16k, 16000, 25, 10, 13, "mfcc", True)
    T = want.shape[0]
    assert int(featlen[0]) == T
    np.testing.assert_allclose(np.asarray(feats)[0, :T], want,
                               rtol=5e-3, atol=5e-3)
