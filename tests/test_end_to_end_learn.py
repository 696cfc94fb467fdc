"""End-to-end learnability gate: synthetic tone-language corpus through the
REAL pipeline — on-device frontend -> LAS training -> greedy decode and
on-device beam decode -> WER.

Each "word" is a pure tone at a character-specific frequency; a model that
learns the mapping must reach low WER.  This is the strongest integration
gate: if framing, CMVN, masking, the encoder reduction, attention, the
losses or the decoders are broken, WER stays at ~1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.decoding import beam as beam_lib
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.ops import frontend
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.utils.text import corpus_wer
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

SR = 16000
CHARS = ["A", "B", "C", "D"]
FREQS = {"A": 400.0, "B": 800.0, "C": 1600.0, "D": 3200.0}
TONE_S = 0.12


def synth(text, rng):
    """Render 'A B A' as concatenated tones with small noise."""
    parts = []
    for ch in text.split(" "):
        t = np.arange(int(TONE_S * SR)) / SR
        parts.append(np.sin(2 * np.pi * FREQS[ch] * t))
    sig = np.concatenate(parts)
    return (sig + 0.01 * rng.standard_normal(len(sig))).astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    texts, sigs = [], []
    for _ in range(24):
        n = int(rng.integers(2, 5))
        text = " ".join(rng.choice(CHARS, n))
        texts.append(text)
        sigs.append(synth(text, rng))
    return texts, sigs


def test_pipeline_learns_tone_language(corpus):
    texts, sigs = corpus
    tok = CharEncoder()
    cfg = Config(unit="char", vocab_size=30, feat_dim=13, feat_type="mfcc",
                 cmvn=True, enc_type="cnn", enc_units=32,
                 num_enc_channels=8, num_enc_layers=1, dec_units=32,
                 num_dec_layers=1, embedding_size=16, attention_size=16,
                 mode="add", dropout_rate=0.0, label_smoothing=False,
                 lr=3e-3,
                 # scheduled sampling fights exposure bias so the
                 # free-running decode matches teacher-forced training
                 scheduled_sampling=True, warmup_step=100, max_step=250,
                 min_rate=0.5)

    # REAL on-device frontend
    maxlen = max(len(s) for s in sigs)
    audio = np.zeros((len(sigs), maxlen), np.float32)
    for i, s in enumerate(sigs):
        audio[i, :len(s)] = s
    audiolen = np.asarray([len(s) for s in sigs], np.int32)
    feats, featlen = frontend.extract_features_cfg(
        jnp.asarray(audio), jnp.asarray(audiolen), cfg)
    feats = np.asarray(feats)
    featlen = np.asarray(featlen)

    L = 12
    ys = np.zeros((len(texts), L), np.int32)
    yslen = np.zeros((len(texts),), np.int32)
    for i, t in enumerate(texts):
        ids = tok.encode(t, with_eos=True)
        ys[i, :len(ids)] = ids
        yslen[i] = len(ids)
    batch = (feats, featlen, ys, yslen)

    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    loss0 = None
    for step in range(400):
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=L)
        if loss0 is None:
            loss0 = float(m["loss"])
    loss = float(m["loss"])
    assert loss < 0.15 * loss0, (loss0, loss)

    # greedy decode (the test.py path)
    _, y_hat = trainer.eval_forward(ts.params, ts.bn_state, feats, featlen,
                                    cfg, dec_steps=L)
    hyps = [tok.decode(list(np.asarray(y_hat)[i])) for i in range(len(texts))]
    wer_greedy = corpus_wer(texts, hyps)

    # on-device beam decode (the decode.py path)
    res = beam_lib.beam_search(ts.params, ts.bn_state, jnp.asarray(feats),
                               jnp.asarray(featlen), cfg.replace(
                                   convert_rate=float(L) / feats.shape[1]),
                               max_steps=L, beam_size=3)
    toks = np.asarray(res.tokens)
    tlen = np.asarray(res.lengths)
    hyps_beam = [tok.decode(list(toks[i, 0, :tlen[i, 0]]))
                 for i in range(len(texts))]
    wer_beam = corpus_wer(texts, hyps_beam)

    assert wer_greedy < 0.30, (wer_greedy, hyps[:5], texts[:5])
    assert wer_beam < 0.30, (wer_beam, hyps_beam[:5], texts[:5])


def test_synth_speech_learnability(rng):
    """Formant-synthesized SPEECH (not tones) through the real frontend
    must be learnable: a tiny LAS overfits 12 two-word utterances.
    Locks the synthesizer -> frontend -> training loop end to end."""
    from automatic_speech_recognition_tpu.utils import formant_synth as fsyn
    from automatic_speech_recognition_tpu.ops import frontend
    from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

    words = {"GO": "G OW", "UP": "AH P", "RED": "R EH D", "SEA": "S IY"}
    tok = CharEncoder()
    texts = []
    sigs = []
    g = np.random.default_rng(0)
    names = list(words)
    for i in range(12):
        pair = (names[i % 4], names[(i // 4 + 1) % 4])
        texts.append(" ".join(pair))
        phones = words[pair[0]].split() + ["SP"] + words[pair[1]].split()
        sigs.append(fsyn.synth_phones(phones, fsyn.Speaker(), g))
    S = max(len(s) for s in sigs)
    audio = np.zeros((12, S), np.float32)
    alen = np.zeros((12,), np.int32)
    for i, s in enumerate(sigs):
        audio[i, :len(s)] = s
        alen[i] = len(s)
    feats, featlen = frontend.extract_features(audio, alen, feat_dim=8)
    ys = np.zeros((12, 10), np.int32)
    yslen = np.zeros((12,), np.int32)
    for i, t in enumerate(texts):
        ids = tok.encode(t, with_eos=True)
        ys[i, :len(ids)] = ids
        yslen[i] = len(ids)
    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
                 enc_units=16, num_enc_channels=4, num_enc_layers=1,
                 dec_units=16, num_dec_layers=1, embedding_size=8,
                 attention_size=8, mode="add", dropout_rate=0.0,
                 scheduled_sampling=False, label_smoothing=False, lr=5e-3)
    batch = (np.asarray(feats), np.asarray(featlen), ys, yslen)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    losses = []
    for _ in range(70):
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=10)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])
