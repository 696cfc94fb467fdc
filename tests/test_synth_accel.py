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
