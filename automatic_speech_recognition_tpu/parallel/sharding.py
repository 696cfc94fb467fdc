"""Parameter/batch sharding rules for pjit-style SPMD training.

The reference has no distributed layer at all (SURVEY.md §2 "Parallelism
inventory": single tf.Session, hardcoded CUDA_VISIBLE_DEVICES).  Here the
whole train step is ONE jitted SPMD program over a ('data', 'model') mesh:

- batch dims sharded over 'data' (DP); XLA inserts the gradient psum over
  ICI automatically (GSPMD propagation), no user collectives.
- 2-D weight matrices with a 'model'-divisible output dim are sharded over
  'model' (tensor parallelism for the big dense/recurrent kernels); the
  matching activation shardings are propagated by GSPMD, with collectives
  (all-gather / reduce-scatter) riding ICI.
- everything else (biases, BN stats, scalars, opt-state hparams) is
  replicated.

All rules are expressed as PartitionSpec pytrees so the same code runs on
1 chip, the 8-device CPU simulation, or a pod slice.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(leaf, model_size: int, model_axis: str = "model") -> P:
    """Sharding rule for one parameter leaf.

    2-D kernels whose output dim divides the model axis are split over
    'model' (column parallelism); large embedding tables split over the
    embedding dim.  Everything else replicates.
    """
    shape = jnp.shape(leaf)
    if model_size <= 1 or len(shape) < 2:
        return P()
    if shape[-1] % model_size == 0 and shape[-1] >= 2 * model_size:
        return P(*([None] * (len(shape) - 1)), model_axis)
    return P()


def param_specs(params: Any, model_size: int, model_axis: str = "model"):
    """PartitionSpec pytree for a params (or grads/opt-state) pytree."""
    return jax.tree_util.tree_map(
        lambda x: param_spec(x, model_size, model_axis), params)


def state_shardings(mesh: Mesh, train_state, model_axis: str = "model"):
    """NamedSharding pytree for a TrainState: params + opt-state sharded by
    the param rule (Adam moments follow their parameters), counters and RNG
    replicated."""
    model_size = mesh.shape[model_axis]

    def rule(x):
        return NamedSharding(mesh, param_spec(x, model_size, model_axis))

    return jax.tree_util.tree_map(rule, train_state)


def batch_pspec(data_axis: str = "data") -> P:
    return P(data_axis)


def batch_shardings(mesh: Mesh, batch, data_axis: str = "data"):
    sh = NamedSharding(mesh, P(data_axis))
    return jax.tree_util.tree_map(lambda _: sh, batch)


def place_state(mesh: Mesh, train_state, model_axis: str = "model"):
    """Device-put a host TrainState onto the mesh per the sharding rules."""
    sh = state_shardings(mesh, train_state, model_axis)
    return jax.tree_util.tree_map(jax.device_put, train_state, sh)


def place_eval_params(mesh: Mesh, params, bn_state,
                      model_axis: str = "model"):
    """Device-put (params, bn_state) onto the mesh for sharded inference.

    Params follow the same tensor-parallel rule as training
    (param_spec); BN statistics replicate (they are per-feature
    vectors).  Inference entry points (trainer.eval_forward,
    decoding/beam.beam_search, decoding/ctc.ctc_greedy_decode) are plain
    jax.jit programs, so placing their inputs is all it takes: jit
    compiles one SPMD program over whatever mesh the committed input
    shardings name, and GSPMD propagates the activation shardings —
    the same mechanism make_mesh_train_step uses explicitly.  The
    reference hardcodes a single device for eval and batch=1 beam decode
    (reference test.py:24, decode.py:24, beam_search.py:70-72); this is
    the beaten-path upgrade: one jitted eval/beam program over N cores.
    """
    model_size = mesh.shape[model_axis]
    p = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, param_spec(x, model_size, model_axis))),
        params)
    rep = NamedSharding(mesh, P())
    b = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), bn_state)
    return p, b


def place_data_batch(mesh: Mesh, arrays, data_axis: str = "data"):
    """Device-put host arrays sharded along dim 0 over the data axis.
    Every array's dim 0 must be divisible by the axis size — callers pad
    partial batches up to a multiple first (pad_batch_to)."""
    sh = NamedSharding(mesh, P(data_axis))
    return tuple(jax.device_put(a, sh) for a in arrays)


def pad_batch_to(n: int, multiple: int) -> int:
    """Rows a batch must be padded to so dim 0 shards evenly."""
    return -(-n // max(multiple, 1)) * max(multiple, 1)
