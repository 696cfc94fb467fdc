"""Sharding-rule unit tests: PartitionSpec assignment, mesh construction,
state sharding trees, and an explicit TP-correctness check (sharded vs
single-device training step produce identical losses)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.parallel import sharding as sh
from automatic_speech_recognition_tpu.parallel.mesh import make_mesh
from automatic_speech_recognition_tpu.training import trainer

TINY = dict(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
            enc_units=16, num_enc_channels=4, num_enc_layers=1,
            dec_units=16, num_dec_layers=1, embedding_size=8,
            attention_size=8, mode="add", dropout_rate=0.0,
            scheduled_sampling=False, lr=1e-3)


def test_param_spec_rules():
    # 2-D kernel with divisible output dim: column-parallel
    assert sh.param_spec(jnp.zeros((8, 16)), 2) == P(None, "model")
    # output dim too small relative to the axis: replicate
    assert sh.param_spec(jnp.zeros((8, 2)), 2) == P()
    # not divisible: replicate
    assert sh.param_spec(jnp.zeros((8, 15)), 2) == P()
    # 1-D (biases) and scalars: replicate
    assert sh.param_spec(jnp.zeros((16,)), 2) == P()
    assert sh.param_spec(jnp.zeros(()), 2) == P()
    # model_size 1: everything replicated
    assert sh.param_spec(jnp.zeros((8, 16)), 1) == P()


def test_make_mesh_shapes():
    mesh = make_mesh(num_devices=8, num_partitions=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh1 = make_mesh(num_devices=8, num_partitions=1)
    assert dict(mesh1.shape) == {"data": 8, "model": 1}
    import pytest
    with pytest.raises(ValueError):
        make_mesh(num_devices=8, num_partitions=3)


def test_sharded_step_matches_single_device(rng):
    """dp=4 x tp=2 mesh training step must produce the same loss as the
    plain single-device step (GSPMD correctness over our spec rules)."""
    cfg = Config(**TINY, num_partitions=2)
    batch = (rng.standard_normal((8, 32, 8, 3)).astype(np.float32),
             np.full((8,), 32, np.int32),
             rng.integers(3, 29, (8, 8)).astype(np.int32),
             np.full((8,), 8, np.int32))
    losses = {}
    # single device
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    _, m = trainer.train_step(ts, batch, cfg, dec_steps=8)
    losses["single"] = float(m["loss"])
    # sharded
    mesh = make_mesh(num_devices=8, num_partitions=2)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn, sharded_ts, shard_batch = trainer.make_mesh_train_step(
        mesh, ts, batch, cfg)
    _, m = step_fn(sharded_ts, shard_batch(batch))
    losses["sharded"] = float(m["loss"])
    np.testing.assert_allclose(losses["single"], losses["sharded"],
                               rtol=1e-5)


def _eval_setup(rng, num_partitions=1, ctc=False):
    from automatic_speech_recognition_tpu.models import las
    cfg = Config(**TINY, num_partitions=num_partitions, ctc=ctc,
                 beam_logprob=True,
                 ctc_beam_weight=0.5 if ctc else 0.0)
    params, bn_state = las.las_init(jax.random.PRNGKey(0), cfg)
    audio = rng.standard_normal((8, 32, 8, 3)).astype(np.float32)
    audiolen = np.asarray([32, 30, 28, 32, 17, 32, 25, 32], np.int32)
    return cfg, params, bn_state, audio, audiolen


def test_sharded_eval_forward_matches_single_device(rng):
    """Greedy eval over a dp4 x tp2 mesh must produce the same tokens as
    the plain single-device forward (round-4: test.py routes through the
    mesh; the reference hardcodes one device, test.py:24)."""
    cfg, params, bn_state, audio, audiolen = _eval_setup(
        rng, num_partitions=2)
    logits1, y1 = trainer.eval_forward(params, bn_state,
                                       jnp.asarray(audio),
                                       jnp.asarray(audiolen), cfg,
                                       dec_steps=10)
    mesh = make_mesh(num_devices=8, num_partitions=2)
    p, b = sh.place_eval_params(mesh, params, bn_state)
    audio_d, audiolen_d = sh.place_data_batch(mesh, (audio, audiolen))
    logits8, y8 = trainer.eval_forward(p, b, audio_d, audiolen_d, cfg,
                                       dec_steps=10)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y8))


def test_sharded_beam_matches_single_device(rng):
    """Beam-8 decode over the mesh must produce the same hypotheses as
    the single-device program (decode.py's round-4 mesh routing; the
    reference beam is batch=1 on one device, beam_search.py:70-72)."""
    from automatic_speech_recognition_tpu.decoding import beam as beam_lib
    cfg, params, bn_state, audio, audiolen = _eval_setup(
        rng, num_partitions=2, ctc=True)
    kw = dict(max_steps=10, beam_size=4, logprob=True)
    r1 = beam_lib.beam_search(params, bn_state, jnp.asarray(audio),
                              jnp.asarray(audiolen), cfg, **kw)
    mesh = make_mesh(num_devices=8, num_partitions=2)
    p, b = sh.place_eval_params(mesh, params, bn_state)
    audio_d, audiolen_d = sh.place_data_batch(mesh, (audio, audiolen))
    r8 = beam_lib.beam_search(p, b, audio_d, audiolen_d, cfg, **kw)
    np.testing.assert_array_equal(np.asarray(r1.tokens),
                                  np.asarray(r8.tokens))
    np.testing.assert_array_equal(np.asarray(r1.lengths),
                                  np.asarray(r8.lengths))
    np.testing.assert_allclose(np.asarray(r1.scores),
                               np.asarray(r8.scores), rtol=1e-4,
                               atol=1e-5)
