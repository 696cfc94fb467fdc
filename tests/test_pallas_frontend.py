"""Pallas frontend kernel parity (interpret mode on CPU).

The fused whole-utterance kernel (ops/pallas_frontend.py: overlap-reuse
DFT + mel-support pruning + in-VMEM CMVN/deltas) must match the XLA
einsum path (ops/frontend.py) for both feature types, with and without
CMVN, across ragged lengths.  On real TPU v5e the same comparison ran at
max-abs-err 7.7e-5 post-CMVN and 5.38 ms vs XLA's 7.56 ms per 128x10s
batch — the kernel is the TPU default (benchmarks/RESULTS.md).
"""

import numpy as np
import pytest

from automatic_speech_recognition_tpu.ops import frontend


@pytest.mark.parametrize("feat_type", ["mfcc", "fbank"])
@pytest.mark.parametrize("apply_cmvn", [True, False])
def test_pallas_matches_xla(rng, feat_type, apply_cmvn):
    B, S = 3, 16000 * 2 + 1234
    audio = (rng.standard_normal((B, S)) * 0.1).astype(np.float32)
    audiolen = np.array([S, S - 9000, 20000], np.int32)
    kw = dict(feat_dim=13, feat_type=feat_type, apply_cmvn=apply_cmvn)
    fa, la = frontend.extract_features(audio, audiolen, **kw)
    fb, lb = frontend.extract_features(audio, audiolen, use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert fa.shape == fb.shape
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("apply_cmvn", [True, False])
def test_pallas_chunked_long_utterance(rng, apply_cmvn):
    """Utterances beyond the whole-utterance VMEM budget (MAX_FRAMES)
    route through fused_frontend_chunked and still match XLA — this is
    the 36 s eval-bucket shape that previously fell back to XLA."""
    from automatic_speech_recognition_tpu.ops import pallas_frontend as pk

    flen, fstride = 400, 160
    frames_max = pk.MAX_FRAMES + 500                   # forces chunking
    S = frames_max * fstride + flen
    B = 2
    audio = (rng.standard_normal((B, S)) * 0.1).astype(np.float32)
    audiolen = np.array([S, S // 2], np.int32)
    kw = dict(feat_dim=13, frames_max=frames_max, apply_cmvn=apply_cmvn)
    fa, la = frontend.extract_features(audio, audiolen, **kw)
    fb, lb = frontend.extract_features(audio, audiolen, use_pallas=True,
                                       **kw)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert fa.shape == fb.shape
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=1e-4, atol=2e-4)


def test_pallas_respects_frames_max(rng):
    B, S = 2, 16000
    audio = (rng.standard_normal((B, S)) * 0.1).astype(np.float32)
    audiolen = np.full((B,), S, np.int32)
    f, l = frontend.extract_features(audio, audiolen, feat_dim=13,
                                     frames_max=500, use_pallas=True)
    assert f.shape[1] == 500
    # frames beyond featlen are zeroed
    assert np.allclose(np.asarray(f)[0, int(l[0]):], 0.0)
