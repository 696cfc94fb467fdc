"""Edge cases: zero/short lengths, empty strings, single-step beams."""

import jax
import numpy as np

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.decoding import beam as beam_lib
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.ops import frontend
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.utils.text import corpus_wer, edit_distance
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

TINY = dict(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
            enc_units=12, num_enc_channels=4, num_enc_layers=1,
            dec_units=12, num_dec_layers=1, embedding_size=8,
            attention_size=8, mode="add", dropout_rate=0.0,
            scheduled_sampling=False)


def test_zero_length_utterance_stays_finite(rng):
    cfg = Config(**TINY)
    params, bn = las.las_init(jax.random.PRNGKey(0), cfg)
    audio = rng.standard_normal((2, 16, 8, 3)).astype(np.float32)
    audiolen = np.asarray([16, 0], np.int32)  # second utt fully padded
    logits, y_hat = trainer.eval_forward(params, bn, audio, audiolen, cfg,
                                         dec_steps=4)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_frontend_shorter_than_frame(rng):
    audio = rng.standard_normal((1, 1000)).astype(np.float32)
    audiolen = np.asarray([200], np.int32)  # < 400-sample frame
    feats, featlen = frontend.extract_features(audio, audiolen, feat_dim=8)
    assert int(featlen[0]) == 0
    assert np.all(np.isfinite(np.asarray(feats)))


def test_beam_single_step(rng):
    cfg = Config(**TINY, convert_rate=0.001)  # forces dec_step clamp to 1
    params, bn = las.las_init(jax.random.PRNGKey(0), cfg)
    audio = rng.standard_normal((1, 16, 8, 3)).astype(np.float32)
    res = beam_lib.beam_search(params, bn, audio,
                               np.asarray([16], np.int32), cfg,
                               max_steps=3, beam_size=2)
    assert int(res.lengths[0, 0]) >= 1
    assert np.isfinite(float(res.scores[0, 0]))


def test_empty_hypothesis_wer():
    d, n = edit_distance(["A", "B"], [""])
    assert n == 2 and d >= 1
    assert corpus_wer(["A B"], [""]) > 0


def test_tokenizer_empty_string():
    tok = CharEncoder()
    assert tok.encode("", with_eos=True) == [2]
    assert tok.decode([2]) == ""
