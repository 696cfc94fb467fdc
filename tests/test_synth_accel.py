"""Corpus-synthesis fast paths (round 4).

Three performance rewrites in the synthesis tooling, each with an exact
contract:

- the production FLAC encoder's bulk path for the corpus-writer
  configuration (mono/16-bit/verbatim) must be BIT-IDENTICAL to the
  generic BitWriter path (data/flac_encode.py);
- the vectorized 2-D ``_upsample`` must be BIT-IDENTICAL to the
  per-column np.interp it replaced (utils/formant_synth.py);
- the opt-in device-accelerated voiced part (``enable_accel``) may drift
  at float32 rounding scale but must consume the host rng stream
  IDENTICALLY, so transcripts / speaker draws / noise realizations of an
  accel corpus match the pure-NumPy corpus bit-for-bit.

No reference counterpart (the reference downloads recorded speech,
prepare_libri_data.sh); this guards tools/synth_corpus.py.
"""

import numpy as np
import pytest

from automatic_speech_recognition_tpu.data.flac_encode import encode_flac
from automatic_speech_recognition_tpu.utils import formant_synth as fs


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("n", [1, 4095, 4096, 9999])
def test_flac_bulk_path_bit_identical(rng, n):
    x = rng.integers(-32768, 32768, n).astype(np.int32)
    fast = encode_flac([x], blocksize=4096, subframe_kind="verbatim")
    # passing any explicit subframe kwarg routes through the generic
    # BitWriter path (lpc_order is a no-op for verbatim subframes)
    slow = encode_flac([x], blocksize=4096, subframe_kind="verbatim",
                       lpc_order=2)
    assert fast == slow


@pytest.mark.parametrize("T,K", [(2, 1), (7, 3), (200, 95), (513, 40)])
def test_upsample2d_bit_identical_to_interp(rng, T, K):
    tr = rng.standard_normal((T, K))
    n = T * fs.HOP
    got = fs._upsample(tr, n)
    xp = np.arange(T) * fs.HOP
    xs = np.arange(n)
    want = np.stack([np.interp(xs, xp, tr[:, j]) for j in range(K)], axis=1)
    assert np.array_equal(got, want)


PHONES = ["HH", "AH", "L", "OW", "SIL", "W", "ER", "L", "D"]


def test_accel_voiced_drift_bounded_and_rng_preserved():
    spk = fs.Speaker()
    saved = fs._accel_fn
    try:
        fs._accel_fn = None
        r1 = np.random.default_rng(7)
        host = fs.synth_phones(PHONES, spk, r1)

        assert fs.enable_accel("cpu")
        r2 = np.random.default_rng(7)
        dev = fs.synth_phones(PHONES, spk, r2)

        assert host.shape == dev.shape
        drift = np.abs(host.astype(np.float64) - dev.astype(np.float64))
        peak = np.abs(host).max()
        assert drift.max() < 5e-3 * peak / 0.3  # observed ~8.5e-4 relative
        # identical rng consumption: the next draw from both streams agrees
        assert r1.integers(1 << 30) == r2.integers(1 << 30)
    finally:
        fs._accel_fn = saved


def test_accel_drift_length_independent():
    """Phase is computed host-side in float64 (advisor r4, medium): a
    device f32 cumsum accumulated error with the running sum, so drift
    grew with utterance length (1.9% relative at 15.6 s, thirds
    0.36%→1.05%→1.93%).  Now the final third of a long utterance must
    drift no more than f32 rounding scale, same as the first."""
    spk = fs.Speaker()
    long_phones = PHONES * 10   # ~13 s
    saved = fs._accel_fn
    try:
        fs._accel_fn = None
        host = fs.synth_phones(long_phones, spk, np.random.default_rng(7))
        assert fs.enable_accel("cpu")
        dev = fs.synth_phones(long_phones, spk, np.random.default_rng(7))
        n = host.shape[0]
        peak = np.abs(host).max()
        thirds = [np.abs(host[i * n // 3:(i + 1) * n // 3]
                         - dev[i * n // 3:(i + 1) * n // 3]).max() / peak
                  for i in range(3)]
        # every third within f32 rounding scale; no growth trend
        assert max(thirds) < 5e-3, thirds
        assert thirds[2] < 4.0 * max(thirds[0], 1e-5), thirds
    finally:
        fs._accel_fn = saved


def test_accel_last_segment_holds_not_ramps():
    """Edge-padded env (advisor r4, low): with zero padding the kernel's
    last real segment interpolated toward the pad frame, so the final
    HOP samples ramped instead of holding np.interp's tail clamp.  A
    non-silent-final phone sequence must still match the host tail."""
    spk = fs.Speaker()
    phones = ["HH", "AH", "L", "OW"]   # ends voiced, no trailing SIL
    saved = fs._accel_fn
    try:
        fs._accel_fn = None
        host = fs.synth_phones(phones, spk, np.random.default_rng(3))
        assert fs.enable_accel("cpu")
        dev = fs.synth_phones(phones, spk, np.random.default_rng(3))
        tail = slice(-2 * fs.HOP, None)
        peak = np.abs(host).max()
        assert np.abs(host[tail] - dev[tail]).max() < 5e-3 * peak
    finally:
        fs._accel_fn = saved
