"""Upstream speechpy bit-exactness — auto-skipped until the package
exists (VERDICT round 2, Missing #3; reference preprocess.py:72-87).

This environment has no package index, so the grounding chain today is:
  frontend_host (from-scratch semantics)  ==  tests/speechpy_reference.py
  (independent transcription in upstream's code shape)  ==  pinned
  real-audio goldens (tests/fixtures/).
The one link that cannot be tested offline is "transcription == actual
speechpy v2.4".  This module closes it the day network exists:

    pip install speechpy==2.4 scipy
    python -m pytest tests/test_speechpy_upstream.py -q

Every test compares ACTUAL upstream speechpy output against BOTH the
production golden (ops/frontend_host.py) and the transcription
(tests/speechpy_reference.py) on the pinned real-audio fixture, at the
exact call signatures the reference uses (preprocess.py:72-87).
See docs/DAY_ONE.md for the full network-day runbook.
"""

import numpy as np
import pytest

speechpy = pytest.importorskip(
    "speechpy",
    reason="no package index in this environment; run on network day "
           "(docs/DAY_ONE.md)")

from automatic_speech_recognition_tpu.ops import frontend_host as host
import test_frontend_golden as golden
import speechpy_reference as transcription


@pytest.fixture(scope="module")
def pluck16k():
    sig = golden.load_pluck()
    from automatic_speech_recognition_tpu.ops.augmentation import (
        speed_perturb)
    return speed_perturb(sig, 11025.0 / 16000.0)


def test_upstream_version():
    """The reference pins speechpy 2.4 (requirements.txt); other versions
    changed framing/rounding conventions, so flag a mismatch loudly
    rather than letting a later assert fail confusingly."""
    ver = getattr(speechpy, "__version__", "unknown")
    assert ver.startswith("2.4"), (
        f"installed speechpy {ver}; the parity target is 2.4 — "
        "pip install speechpy==2.4")


def test_mfcc_matches_upstream(pluck16k):
    """speechpy.feature.mfcc at the reference's exact call
    (preprocess.py:75-78: 25 ms / 10 ms, num_cepstral=13)."""
    want = speechpy.feature.mfcc(
        pluck16k, sampling_frequency=16000, frame_length=0.025,
        frame_stride=0.01, num_cepstral=13)
    got_host = host.mfcc(pluck16k, 16000, 25, 10, 13)
    got_trans = transcription.mfcc(
        pluck16k, sampling_frequency=16000, frame_length=0.025,
        frame_stride=0.01, num_cepstral=13)
    np.testing.assert_allclose(got_host, want, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(got_trans, want)  # same code shape


def test_mfe_matches_upstream(pluck16k):
    """speechpy.feature.mfe (the fbank path, preprocess.py:80-82)."""
    want, energy = speechpy.feature.mfe(
        pluck16k, sampling_frequency=16000, frame_length=0.025,
        frame_stride=0.01)
    got, got_energy = transcription.mfe(
        pluck16k, sampling_frequency=16000, frame_length=0.025,
        frame_stride=0.01)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_energy, energy)


def test_cmvn_matches_upstream(pluck16k):
    """speechpy.processing.cmvn with variance normalization
    (preprocess.py:84)."""
    feats = host.mfcc(pluck16k, 16000, 25, 10, 13)
    want = speechpy.processing.cmvn(feats, variance_normalization=True)
    got = host.cmvn(feats, variance_normalization=True)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_derivative_matches_upstream(pluck16k):
    """speechpy.feature.extract_derivative_feature (preprocess.py:85-87;
    the 9-tap quirk frontend_host reproduces)."""
    feats = host.mfcc(pluck16k, 16000, 25, 10, 13)
    want = speechpy.feature.extract_derivative_feature(feats)
    got = host.extract_derivative_feature(feats)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_full_reference_composition_matches_upstream(pluck16k):
    """The exact end-to-end composition the reference runs per utterance
    (preprocess.py:72-87: mfcc -> cmvn -> derivative stack) vs
    host.process_audio, which is what production shards are built from."""
    feats = speechpy.feature.mfcc(
        pluck16k, sampling_frequency=16000, frame_length=0.025,
        frame_stride=0.01, num_cepstral=13)
    feats = speechpy.processing.cmvn(feats, variance_normalization=True)
    want = speechpy.feature.extract_derivative_feature(feats)
    got = host.process_audio(pluck16k, 16000, 25, 10, 13, "mfcc", True)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
