"""Layer-level tests: RNN cells vs manual math, fused BiRNN equivalence,
BN semantics, attention masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automatic_speech_recognition_tpu.ops import attention as att
from automatic_speech_recognition_tpu.ops import layers as L


def test_rnn_cell_matches_manual():
    key = jax.random.PRNGKey(0)
    p = L.rnn_cell_init(key, 3, 4)
    x = np.random.default_rng(0).standard_normal((2, 3)).astype(np.float32)
    h = np.random.default_rng(1).standard_normal((2, 4)).astype(np.float32)
    got = L.rnn_cell_apply(p, jnp.asarray(x), jnp.asarray(h))
    want = np.tanh(np.concatenate([x, h], -1) @ np.asarray(p["w"]) + np.asarray(p["b"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_lstm_cell_matches_manual():
    key = jax.random.PRNGKey(1)
    p = L.lstm_cell_init(key, 3, 4)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    c = rng.standard_normal((2, 4)).astype(np.float32)
    h = rng.standard_normal((2, 4)).astype(np.float32)
    out, (nc, nh) = L.lstm_cell_apply(p, jnp.asarray(x), (jnp.asarray(c), jnp.asarray(h)))
    z = np.concatenate([x, h], -1) @ np.asarray(p["w"]) + np.asarray(p["b"])
    i, j, f, o = np.split(z, 4, -1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    want_c = c * sig(f + 0.0) + sig(i) * np.tanh(j)
    want_h = np.tanh(want_c) * sig(o)
    np.testing.assert_allclose(np.asarray(nc), want_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nh), want_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), want_h, rtol=1e-5, atol=1e-6)


def test_birnn_fused_equals_two_scans():
    """The single-scan fused bidirectional RNN must equal running fw and bw
    cells independently (tf.nn.bidirectional_dynamic_rnn semantics)."""
    key = jax.random.PRNGKey(3)
    p = L.birnn_init(key, 5, 6)
    xs = jnp.asarray(np.random.default_rng(3).standard_normal((2, 7, 5)), jnp.float32)
    fused, (hf, hb) = L.birnn_apply(p, xs)
    out_fw, hf2 = L.rnn_scan(p["fw"], xs)
    out_bw_rev, hb2 = L.rnn_scan(p["bw"], jnp.flip(xs, 1))
    want = jnp.concatenate([out_fw, jnp.flip(out_bw_rev, 1)], -1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(hb2), rtol=1e-5, atol=1e-5)


def test_bn_train_vs_eval():
    params, state = L.bn_init(4)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((8, 4)) * 3 + 2,
                    jnp.float32)
    y, new_state = L.bn_apply(params, state, x, is_training=True)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std(0), 1, atol=2e-2)
    # moving stats moved toward batch stats with momentum .99
    assert np.all(np.abs(np.asarray(new_state["mean"])) > 0)
    y_eval, s2 = L.bn_apply(params, new_state, x, is_training=False)
    assert s2 is new_state


def test_length_mask():
    m = np.asarray(L.length_mask(jnp.array([2, 3, 1]), 3))
    np.testing.assert_array_equal(m, [[1, 1, 0], [1, 1, 1], [1, 0, 0]])


@pytest.mark.parametrize("mode", ["add", "loc"])
def test_attention_masks_padding(mode):
    key = jax.random.PRNGKey(5)
    B, T, H, S = 3, 9, 6, 4
    p = att.attention_init(key, mode, H, S, att_size=5, kernel_size=5,
                           num_channels=2)
    hidden = jnp.asarray(np.random.default_rng(5).standard_normal((B, T, H)),
                         jnp.float32)
    state = jnp.asarray(np.random.default_rng(6).standard_normal((B, S)), jnp.float32)
    align = jnp.zeros((B, T))
    seqlen = jnp.array([9, 5, 1])
    ctx, alphas = att.attention_apply(p, mode, hidden, state, align, seqlen)
    a = np.asarray(alphas)
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)
    assert np.all(a[1, 5:] < 1e-6)
    assert np.all(a[2, 1:] < 1e-6)
    assert a[2, 0] == pytest.approx(1.0, rel=1e-5)
    # context of a fully-peaked alignment equals that hidden vector
    np.testing.assert_allclose(np.asarray(ctx)[2], np.asarray(hidden)[2, 0],
                               rtol=1e-4, atol=1e-5)


def test_dropout_scales_and_disables():
    key = jax.random.PRNGKey(7)
    x = jnp.ones((1000,))
    y = L.dropout(key, x, 0.5, is_training=True)
    kept = np.asarray(y) > 0
    assert 0.35 < kept.mean() < 0.65
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
    np.testing.assert_array_equal(np.asarray(L.dropout(key, x, 0.5, False)), 1.0)
