"""Checkpoint averaging (tools/average_checkpoints.py): the averaged
params must be the exact uniform mean, and the output must load through
the standard restore path."""

import os
import sys

import jax
import numpy as np

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from average_checkpoints import average_checkpoints, average_trees  # noqa: E402

TINY = dict(unit="char", feat_dim=8, enc_type="cnn", enc_units=16,
            num_enc_channels=4, num_enc_layers=1, dec_units=16,
            num_dec_layers=1, embedding_size=8, attention_size=8,
            mode="add", dropout_rate=0.0, scheduled_sampling=False)


def test_average_trees_is_uniform_mean():
    a = {"w": np.full((2, 2), 1.0, np.float32), "b": np.array([0.0])}
    b = {"w": np.full((2, 2), 3.0, np.float32), "b": np.array([4.0])}
    avg = average_trees([a, b])
    np.testing.assert_allclose(avg["w"], 2.0)
    np.testing.assert_allclose(avg["b"], 2.0)


def test_average_checkpoints_end_to_end(tmp_path):
    cfg = Config(**TINY, save_dir=str(tmp_path / "src"), vocab_size=0)
    # two checkpoints with different params (different init keys)
    cm = CheckpointManager(cfg.save_dir)
    states = []
    for e, seed in ((1, 0), (2, 1)):
        ts = trainer.create_train_state(jax.random.PRNGKey(seed),
                                        cfg.replace(vocab_size=30))
        ts = jax.device_get(ts)
        cm.save(e, ts)
        states.append(ts)
    cm.close()

    out = str(tmp_path / "avg")
    avg = average_checkpoints(cfg, [1, 2], out)

    # exact uniform mean of one spot-checked leaf
    leaves0 = jax.tree_util.tree_leaves(states[0].params)
    leaves1 = jax.tree_util.tree_leaves(states[1].params)
    leavesA = jax.tree_util.tree_leaves(avg.params)
    for x, y, a in zip(leaves0, leaves1, leavesA):
        np.testing.assert_allclose(np.asarray(a),
                                   (np.asarray(x) + np.asarray(y)) / 2,
                                   rtol=1e-6, atol=1e-7)
    # step/opt state come from the newest source epoch
    assert int(avg.step) == int(states[-1].step)

    # the averaged checkpoint restores through the standard path (epoch 1)
    template = trainer.create_train_state(jax.random.PRNGKey(9),
                                          cfg.replace(vocab_size=30))
    restored = CheckpointManager(out).restore(jax.device_get(template),
                                              epoch=1)
    assert restored is not None
    for a, b in zip(jax.tree_util.tree_leaves(avg.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
