"""Coverage for the optional/quirk configuration paths: bf16 mixed
precision, BN (the reference's unconditional-BN CNN layer quirk),
scheduled sampling, variational noise, CTC-mixed training."""

import jax
import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.training import trainer

BASE = dict(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
            enc_units=16, num_enc_channels=4, num_enc_layers=1,
            dec_units=16, num_dec_layers=1, embedding_size=8,
            attention_size=8, mode="add", dropout_rate=0.0,
            scheduled_sampling=False, apply_bn=False, lr=5e-3)


def make_batch(rng, B=4, T=32, L=8, D=8):
    return (rng.standard_normal((B, T, D, 3)).astype(np.float32),
            np.full((B,), T, np.int32),
            rng.integers(3, 29, (B, L)).astype(np.int32),
            np.full((B,), L, np.int32))


def _steps(cfg, batch, n=3):
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    losses = []
    for _ in range(n):
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=8)
        losses.append(float(m["loss"]))
    return ts, losses


def test_bfloat16_trains_and_tracks_float32(rng):
    batch = make_batch(rng)
    _, l32 = _steps(Config(**BASE), batch)
    _, l16 = _steps(Config(**{**BASE, "dtype": "bfloat16"}), batch)
    assert all(np.isfinite(l16))
    # same init, same data: losses should agree to bf16 precision
    np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
    assert l16[-1] < l16[0]


def test_bfloat16_state_dtypes_stable(rng):
    """Params, BN state and optimizer state must stay float32 so
    checkpoints and donation buffers keep a stable tree."""
    cfg = Config(**{**BASE, "dtype": "bfloat16", "apply_bn": True})
    batch = make_batch(rng)
    ts, _ = _steps(cfg, batch)
    for leaf in jax.tree_util.tree_leaves((ts.params, ts.bn_state)):
        assert leaf.dtype != jax.numpy.bfloat16, leaf.dtype


def test_apply_bn_training_and_eval(rng):
    cfg = Config(**{**BASE, "apply_bn": True})
    batch = make_batch(rng)
    ts, losses = _steps(cfg, batch, n=4)
    assert all(np.isfinite(losses))
    # moving stats must have moved away from init (0 mean / 1 var)
    moved = [np.abs(np.asarray(x)).sum() > 0
             for k, x in jax.tree_util.tree_leaves_with_path(ts.bn_state)
             if "mean" in str(k)]
    assert any(moved)
    logits, y_hat = trainer.eval_forward(ts.params, ts.bn_state, batch[0],
                                         batch[1], cfg, dec_steps=8)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_scheduled_sampling_path(rng):
    cfg = Config(**{**BASE, "scheduled_sampling": True, "warmup_step": 1,
                    "max_step": 5, "min_rate": 0.4})
    batch = make_batch(rng)
    ts, losses = _steps(cfg, batch, n=6)
    assert all(np.isfinite(losses))
    # tf rate decays linearly to min_rate (las/las.py:177-183)
    r0 = float(las.scheduled_sampling_rate(cfg, 1))
    r_end = float(las.scheduled_sampling_rate(cfg, 10))
    assert r0 == pytest.approx(1.0)
    assert r_end == pytest.approx(0.4)


def test_variational_noise_and_ctc(rng):
    cfg = Config(**{**BASE, "add_vn": True, "ctc": True, "ctc_weight": 0.2})
    batch = make_batch(rng)
    _, losses = _steps(cfg, batch)
    assert all(np.isfinite(losses))


def test_grad_accumulation(rng):
    """grad_accum_steps=2: params move only every 2nd micro-batch, and the
    move equals one step on the averaged gradients."""
    cfg = Config(**{**BASE, "grad_accum_steps": 2})
    batch = make_batch(rng)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    p0 = np.asarray(jax.tree_util.tree_leaves(ts.params)[0])
    ts, _ = trainer.train_step(ts, batch, cfg, dec_steps=8)
    p1 = np.asarray(jax.tree_util.tree_leaves(ts.params)[0])  # copy now:
    ts, _ = trainer.train_step(ts, batch, cfg, dec_steps=8)   # (donation)
    p2 = np.asarray(jax.tree_util.tree_leaves(ts.params)[0])
    np.testing.assert_array_equal(p0, p1)   # held during accumulation
    assert not np.allclose(p1, p2)          # applied on the 2nd micro-batch


def test_remat_matches_plain_gradients(rng):
    """jax.checkpoint on the decoder scan body must not change gradients."""
    import jax.numpy as jnp
    from automatic_speech_recognition_tpu.models import las
    batch = make_batch(rng)
    grads = {}
    for remat in (False, True):
        cfg = Config(**{**BASE, "remat": remat})
        params, bn = las.las_init(jax.random.PRNGKey(0), cfg)

        def lf(p):
            l, _ = las.total_loss(p, bn, batch, cfg, 8,
                                  jax.random.PRNGKey(0), 0)
            return l
        grads[remat] = jax.grad(lf)(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads[False]),
                    jax.tree_util.tree_leaves(grads[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pblstm_encoder_trains(rng):
    """The working pyramidal variant (the reference's is broken as shipped,
    las/las.py:15 vs las/layers.py:56)."""
    cfg = Config(**{**BASE, "enc_type": "pblstm", "num_enc_layers": 2})
    batch = make_batch(rng)
    _, losses = _steps(cfg, batch, n=4)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_location_attention_trains(rng):
    """Published-recipe attention mode (run.sh --mode loc)."""
    cfg = Config(**{**BASE, "mode": "loc", "loc_kernel_size": 7,
                    "loc_num_channels": 3})
    batch = make_batch(rng)
    _, losses = _steps(cfg, batch, n=4)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
