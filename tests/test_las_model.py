"""LAS model tests: shapes for both encoders/attentions, loss masking,
schedules, and a tiny-overfit integration test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.training import trainer


def tiny_cfg(**kw):
    base = dict(feat_dim=8, enc_units=8, num_enc_channels=4, num_enc_layers=1,
                dec_units=8, num_dec_layers=2, embedding_size=8,
                attention_size=8, vocab_size=16, mode="add", enc_type="cnn",
                dropout_rate=0.0, scheduled_sampling=False, label_smoothing=True,
                loc_kernel_size=5, loc_num_channels=2, ctc=False, lr=1e-2)
    base.update(kw)
    return Config(**base)


def fake_batch(cfg, B=2, T=16, T2=6, seed=0):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((B, T, cfg.feat_dim, 3)).astype(np.float32)
    audiolen = np.array([T, T - 4], np.int32)[:B]
    y = rng.integers(1, cfg.vocab_size, (B, T2)).astype(np.int32)
    y[:, -1] = 2  # EOS
    tokenlen = np.full((B,), T2, np.int32)
    return jnp.asarray(audio), jnp.asarray(audiolen), jnp.asarray(y), jnp.asarray(tokenlen)


@pytest.mark.parametrize("enc_type", ["cnn", "pblstm"])
@pytest.mark.parametrize("mode", ["add", "loc"])
def test_forward_shapes(enc_type, mode):
    cfg = tiny_cfg(enc_type=enc_type, mode=mode)
    params, state = las.las_init(jax.random.PRNGKey(0), cfg)
    audio, audiolen, y, tokenlen = fake_batch(cfg)
    logits, ctc_logits, alphas, enc_len, _ = las.las_forward(
        params, state, audio, audiolen, cfg, dec_steps=6, teacher=y,
        is_training=True, rng=jax.random.PRNGKey(1))
    B, T = audio.shape[:2]
    # cnn reduces T by 4, pblstm by 2^num_enc_layers
    T_red = (T + 3) // 4 if enc_type == "cnn" else T // 2
    assert logits.shape == (B, 6, cfg.vocab_size)
    assert alphas.shape == (B, 6, T_red)
    want_len = audiolen
    reductions = 2 if enc_type == "cnn" else cfg.num_enc_layers
    for _ in range(reductions):
        want_len = (want_len + want_len % 2) // 2
    np.testing.assert_array_equal(np.asarray(enc_len), np.asarray(want_len))


def test_enc_out_dim():
    assert las.enc_out_dim(tiny_cfg(enc_type="cnn")) == 8
    assert las.enc_out_dim(tiny_cfg(enc_type="pblstm")) == 16


def test_attention_loss_masks_padding():
    cfg = tiny_cfg()
    B, T2, K = 2, 5, cfg.vocab_size
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((B, T2, K)),
                         jnp.float32)
    y = jnp.array([[3, 4, 2, 0, 0], [5, 6, 7, 8, 2]], jnp.int32)
    full = las.attention_loss(logits, y, cfg)
    # changing logits at padded positions must not change the loss
    logits2 = logits.at[0, 3:].set(100.0)
    full2 = las.attention_loss(logits2, y, cfg)
    np.testing.assert_allclose(float(full), float(full2), rtol=1e-6)


def test_label_smoothing_formula():
    oh = jax.nn.one_hot(jnp.array([1]), 4)
    sm = np.asarray(las.label_smoothing(oh, 0.01))
    np.testing.assert_allclose(sm[0], [0.0025, 0.99 + 0.0025, 0.0025, 0.0025],
                               rtol=1e-6)


def test_scheduled_sampling_rate():
    cfg = tiny_cfg(scheduled_sampling=True, warmup_step=100, max_step=500,
                   min_rate=0.4)
    assert float(las.scheduled_sampling_rate(cfg, jnp.array(0))) == 1.0
    assert float(las.scheduled_sampling_rate(cfg, jnp.array(100))) == 1.0
    mid = float(las.scheduled_sampling_rate(cfg, jnp.array(300)))
    assert mid == pytest.approx(1.0 - 0.5 * 0.6, rel=1e-5)
    assert float(las.scheduled_sampling_rate(cfg, jnp.array(500))) == pytest.approx(0.4)
    assert float(las.scheduled_sampling_rate(cfg, jnp.array(9999))) == pytest.approx(0.4)


def test_scheduled_sampling_warmup_equals_teacher_forcing():
    """During warmup (tf_rate pinned at 1.0) the scheduled-sampling
    program must be semantically pure teacher forcing: same loss as the
    scheduled_sampling=False program for identical params/batch/rng.
    (Reference: tf_rate==1 makes the batch coin always pick the teacher
    branch, las/las.py:100-109.)  The 12k-corpus study showed the two
    compiled programs still diverge over thousands of bf16 steps
    (benchmarks/WER_SYNTH.md seed-control section) — this pins that the
    divergence is rounding/chaos, not a semantic difference."""
    cfg_off = tiny_cfg(scheduled_sampling=False)
    cfg_on = tiny_cfg(scheduled_sampling=True, warmup_step=100,
                      max_step=500, min_rate=0.4)
    params, state = las.las_init(jax.random.PRNGKey(0), cfg_off)
    batch = fake_batch(cfg_off)
    rng = jax.random.PRNGKey(7)
    loss_off, _ = las.total_loss(params, state, batch, cfg_off, 6, rng,
                                 jnp.array(50))
    loss_on, _ = las.total_loss(params, state, batch, cfg_on, 6, rng,
                                jnp.array(50))
    np.testing.assert_allclose(float(loss_on), float(loss_off), rtol=1e-6)


def test_scheduled_learning_rate():
    cfg = tiny_cfg(lr=1e-4)
    assert float(las.scheduled_learning_rate(cfg, 0)) == pytest.approx(1e-4)
    assert float(las.scheduled_learning_rate(cfg, 50000)) == pytest.approx(1e-4)
    assert float(las.scheduled_learning_rate(cfg, 150000)) == pytest.approx(5e-5)
    # floor at 0.01 * lr
    assert float(las.scheduled_learning_rate(cfg, 10**7)) == pytest.approx(1e-6)
    # promoted decay knobs (reference hardcodes them, las/las.py:351-369)
    cfg2 = tiny_cfg(lr=1e-3, lr_decay_start=1000, lr_decay_step=2000,
                    lr_decay_rate=0.5, lr_min_ratio=0.1)
    assert float(las.scheduled_learning_rate(cfg2, 999)) == pytest.approx(1e-3)
    assert float(las.scheduled_learning_rate(cfg2, 3000)) == pytest.approx(5e-4)
    assert float(las.scheduled_learning_rate(cfg2, 10**7)) == pytest.approx(1e-4)


def test_ctc_loss_runs():
    cfg = tiny_cfg(ctc=True)
    params, state = las.las_init(jax.random.PRNGKey(0), cfg)
    batch = fake_batch(cfg)
    loss, (logits, alphas, _) = las.total_loss(
        params, state, batch, cfg, 6, jax.random.PRNGKey(1), jnp.array(0))
    assert np.isfinite(float(loss))


def test_tiny_overfit():
    """Fixed-seed tiny-model overfit: loss must drop sharply on one batch
    (the reference's correctness oracle is training behavior, SURVEY.md #4)."""
    cfg = tiny_cfg()
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    batch = fake_batch(cfg)
    first = None
    for i in range(40):
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=6)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert int(ts.step) == 40
    assert last < first * 0.5, (first, last)


def test_eval_forward_greedy():
    cfg = tiny_cfg()
    params, state = las.las_init(jax.random.PRNGKey(0), cfg)
    audio, audiolen, _, _ = fake_batch(cfg)
    logits, y_hat = trainer.eval_forward(params, state, audio, audiolen, cfg, 7)
    assert y_hat.shape == (2, 7)
    assert logits.shape == (2, 7, cfg.vocab_size)


def test_greedy_eos_margin():
    """--greedy_eos_margin: negative = exact argmax parity; a step is cut
    to EOS exactly when logit(EOS) >= best content logit - margin; a huge
    margin cuts everything."""
    cfg = tiny_cfg()
    params, state = las.las_init(jax.random.PRNGKey(0), cfg)
    audio, audiolen, _, _ = fake_batch(cfg)
    logits, base = trainer.eval_forward(params, state, audio, audiolen,
                                        cfg, 7)
    logits_off, off = trainer.eval_forward(
        params, state, audio, audiolen, cfg.replace(greedy_eos_margin=-1.0), 7)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(logits_off), np.asarray(logits))

    m = 0.7
    _, cut = trainer.eval_forward(
        params, state, audio, audiolen, cfg.replace(greedy_eos_margin=m), 7)
    lg = np.asarray(logits)
    eos_ok = lg[..., 2] >= np.max(lg[..., 3:], -1) - m
    np.testing.assert_array_equal(np.asarray(cut),
                                  np.where(eos_ok, 2, np.asarray(base)))

    _, all_eos = trainer.eval_forward(
        params, state, audio, audiolen,
        cfg.replace(greedy_eos_margin=1e9), 7)
    assert (np.asarray(all_eos) == 2).all()


def test_scan_unroll_is_exact():
    """cfg.scan_unroll changes scheduling only, never the math: forward
    logits at unroll 4 match unroll 1 (incl. a dec_steps not divisible
    by the unroll factor)."""
    cfg1 = tiny_cfg(enc_type="cnn", mode="loc")
    cfg4 = cfg1.replace(scan_unroll=4)
    params, state = las.las_init(jax.random.PRNGKey(0), cfg1)
    audio, audiolen, y, _ = fake_batch(cfg1)
    out = []
    for cfg in (cfg1, cfg4):
        logits, _, alphas, _, _ = las.las_forward(
            params, state, audio, audiolen, cfg, dec_steps=7, teacher=None,
            is_training=False)
        out.append((np.asarray(logits), np.asarray(alphas)))
    np.testing.assert_allclose(out[0][0], out[1][0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out[0][1], out[1][1], rtol=1e-6, atol=1e-6)
