"""Char RNN LM unit tests: step/unrolled consistency, cell variants,
BatchGenerator cursor semantics (lang/char_rnn_model.py:285-324), training
convergence, sampler, and the fusion -2-shift zero-embedding rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from automatic_speech_recognition_tpu.models import char_rnn


def make_cfg(**kw):
    base = dict(vocab_size=10, hidden_size=12, embedding_size=6,
                num_layers=2, num_unrollings=4, batch_size=3, model="lstm",
                learning_rate=1e-2)
    base.update(kw)
    return char_rnn.LMConfig(**base)


@pytest.mark.parametrize("model", ["rnn", "lstm", "gru"])
def test_step_matches_unrolled(model, rng):
    cfg = make_cfg(model=model)
    params = char_rnn.lm_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 10, (3, 5)), jnp.int32)
    state = char_rnn.zero_state(cfg, 3)
    logits_all, final = char_rnn.lm_apply(params, cfg, ids, state)
    state2 = char_rnn.zero_state(cfg, 3)
    outs = []
    for t in range(5):
        step_logits, state2 = char_rnn.lm_step(params, cfg, ids[:, t], state2)
        outs.append(step_logits)
    np.testing.assert_allclose(np.asarray(logits_all),
                               np.stack([np.asarray(o) for o in outs], 1),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(final),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_onehot_input_mode(rng):
    cfg = make_cfg(embedding_size=0)
    params = char_rnn.lm_init(jax.random.PRNGKey(0), cfg)
    assert "embedding" not in params
    logits, _ = char_rnn.lm_step(params, cfg, jnp.asarray([1, 2, 3]),
                                 char_rnn.zero_state(cfg, 3))
    assert logits.shape == (3, 10)


def test_negative_id_embeds_zero():
    """The -2 fusion shift turns <SOS>=1 into -1; it must embed as zeros
    (models/char_rnn.py docstring; beam_search.py:228-229)."""
    cfg = make_cfg()
    params = char_rnn.lm_init(jax.random.PRNGKey(0), cfg)
    x = char_rnn._embed(params, cfg, jnp.asarray([-1, 0]))
    assert np.allclose(np.asarray(x[0]), 0.0)
    assert not np.allclose(np.asarray(x[1]), 0.0)


def test_batch_generator_cursor_semantics():
    """Row 0 of every next() repeats the previous call's last row
    (lang/char_rnn_model.py:306-324); cursors advance modulo text size."""
    ids = np.arange(20, dtype=np.int32)
    gen = char_rnn.BatchGenerator(ids, batch_size=2, n_unrollings=3)
    b1 = gen.next()
    b2 = gen.next()
    assert b1.shape == (4, 2)
    np.testing.assert_array_equal(b2[0], b1[-1])
    # cursors spaced text_size//batch_size apart: first batch row0 = [0, 10]
    np.testing.assert_array_equal(b1[0], [0, 10])
    np.testing.assert_array_equal(b1[1], [1, 11])


def test_lm_training_reduces_ppl(rng):
    cfg = make_cfg(model="lstm", num_unrollings=8, batch_size=4)
    # a deterministic cyclic sequence is perfectly predictable
    ids = np.tile(np.arange(10, dtype=np.int32), 40)
    gen = char_rnn.BatchGenerator(ids, cfg.batch_size, cfg.num_unrollings)
    ts = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), cfg)
    state = char_rnn.zero_state(cfg, cfg.batch_size)
    losses = []
    for _ in range(60):
        rows = gen.next()
        ts, loss, state = char_rnn.lm_train_step(
            ts, rows[:-1].T, rows[1:].T.astype(np.int32), state, cfg)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_sample_seq_greedy_deterministic():
    cfg = make_cfg()
    params = char_rnn.lm_init(jax.random.PRNGKey(0), cfg)
    a = char_rnn.sample_seq(params, cfg, 10, [1, 2], max_prob=True)
    b = char_rnn.sample_seq(params, cfg, 10, [1, 2], max_prob=True)
    assert a == b and len(a) == 10
    c = char_rnn.sample_seq(params, cfg, 10, [1, 2], max_prob=False,
                            rng=jax.random.PRNGKey(3), temperature=2.0)
    assert len(c) == 10
    # regression: sampling with start_ids but NO rng must not crash
    d = char_rnn.sample_seq(params, cfg, 5, [1, 2], max_prob=False)
    assert len(d) == 5


def test_dropout_changes_training_and_is_identity_at_eval():
    """--dropout/--input_dropout must regularize training (reference:
    lang/char_rnn_model.py:82-85, :114-115) and do nothing at eval."""
    base = make_cfg(embedding_size=6)
    drop = base.replace(dropout=0.5, input_dropout=0.3)
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 10, (3, 4)).astype(np.int32)
    targets = rng.integers(0, 10, (3, 4)).astype(np.int32)
    state = char_rnn.zero_state(base, 3)

    ts0 = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), base)
    ts1 = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), drop)
    key = jax.random.PRNGKey(7)
    _, loss_plain, _ = char_rnn.lm_train_step(ts0, inputs, targets, state,
                                              base, key)
    _, loss_drop, _ = char_rnn.lm_train_step(ts1, inputs, targets, state,
                                             drop, key)
    assert abs(float(loss_plain) - float(loss_drop)) > 1e-6
    # different rng -> different dropout mask -> different loss
    _, loss_drop2, _ = char_rnn.lm_train_step(
        ts1, inputs, targets, state, drop, jax.random.PRNGKey(8))
    assert abs(float(loss_drop) - float(loss_drop2)) > 1e-6
    # eval path ignores dropout entirely
    e0, _ = char_rnn.lm_eval_loss(ts0.params, inputs, targets, state, base)
    e1, _ = char_rnn.lm_eval_loss(ts1.params, inputs, targets, state, drop)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-6)


def test_no_input_dropout_on_one_hot():
    """embedding_size <= 0 forces input_dropout to 0
    (lang/char_rnn_model.py:30-34): with cell dropout also 0, training is
    bit-identical to the undropped model."""
    onehot = make_cfg(embedding_size=0)
    dropped = onehot.replace(input_dropout=0.9)
    assert dropped.effective_input_dropout == 0.0
    rng = np.random.default_rng(1)
    inputs = rng.integers(0, 10, (3, 4)).astype(np.int32)
    targets = rng.integers(0, 10, (3, 4)).astype(np.int32)
    state = char_rnn.zero_state(onehot, 3)
    ts0 = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), onehot)
    ts1 = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), dropped)
    key = jax.random.PRNGKey(5)
    _, l0, _ = char_rnn.lm_train_step(ts0, inputs, targets, state, onehot, key)
    _, l1, _ = char_rnn.lm_train_step(ts1, inputs, targets, state, dropped, key)
    assert float(l0) == float(l1)
