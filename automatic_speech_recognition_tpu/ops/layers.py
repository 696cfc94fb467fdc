"""Neural net layer library: functional init/apply pairs over param pytrees.

Replaces the reference's TF1 layer zoo (las/layers.py) with lax.scan-based
recurrences and XLA convs.  Numerical semantics preserved on purpose:

- `lstm`/`blstm` in the reference construct `BasicRNNCell` — a *vanilla
  tanh RNN*, not an LSTM (las/layers.py:8, :31).  `rnn_cell` here is that
  cell: h' = tanh([x, h] @ W + b).  Real LSTM/GRU cells are also provided
  (the reference LM uses a genuine BasicLSTMCell with forget_bias=0,
  lang/char_rnn_model.py:57-65).
- The reference never passes sequence_length to dynamic_rnn, so padded
  steps are processed by the recurrences and only masked later (attention
  and loss); we do the same.
- conv2d: 3x3, stride 2x2, SAME, weight init N(0, 1)*0.01, bias 0.01,
  ReLU (las/layers.py:97-112).
- batch_normalization: momentum 0.99, eps 1e-3 (tf.layers defaults).

TPU-first details: the bidirectional RNN runs forward and backward
directions in ONE scan with a stacked (2B) batch so each step is a single
larger MXU matmul; time-major layout keeps the scan carry small.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Dict:
    p = {"w": glorot_uniform(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def dense_apply(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:  # int8 weight-only inference path (ops/quant.py)
        from . import quant
        y = quant.dequant_matmul(x, p["w_q"], p["w_scale"])
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(key, vocab: int, dim: int) -> Dict:
    """Uniform(-1, 1) init (reference: las/las.py:201-207)."""
    return {"table": jax.random.uniform(key, (vocab, dim), jnp.float32, -1.0, 1.0)}


def embedding_lookup(p: Dict, ids: jnp.ndarray, vn_key=None,
                     vn_std: float = 0.075) -> jnp.ndarray:
    """Lookup with optional variational noise on the whole table
    (reference: las/las.py:162-168)."""
    table = p["table"]
    if vn_key is not None:
        table = table + vn_std * jax.random.normal(vn_key, table.shape, table.dtype)
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# RNN cells
# ---------------------------------------------------------------------------

def rnn_cell_init(key, in_dim: int, units: int) -> Dict:
    """BasicRNNCell params: one fused kernel over [x, h]."""
    return {"w": glorot_uniform(key, (in_dim + units, units)),
            "b": jnp.zeros((units,))}


def rnn_cell_apply(p: Dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    xh = jnp.concatenate([x, h], -1)
    if "w_q" in p:  # int8 weight-only inference path (ops/quant.py)
        from . import quant
        return jnp.tanh(quant.dequant_matmul(xh, p["w_q"], p["w_scale"])
                        + p["b"])
    return jnp.tanh(xh @ p["w"] + p["b"])


def lstm_cell_init(key, in_dim: int, units: int) -> Dict:
    """BasicLSTMCell params (gate order i, j, f, o like TF)."""
    return {"w": glorot_uniform(key, (in_dim + units, 4 * units)),
            "b": jnp.zeros((4 * units,))}


def lstm_cell_apply(p: Dict, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray],
                    forget_bias: float = 0.0):
    """TF BasicLSTMCell semantics; reference LM uses forget_bias=0
    (lang/char_rnn_model.py:63-65)."""
    c, h = state
    xh = jnp.concatenate([x, h], -1)
    if "w_q" in p:  # int8 weight-only inference path (ops/quant.py)
        from . import quant
        z = quant.dequant_matmul(xh, p["w_q"], p["w_scale"]) + p["b"]
    else:
        z = xh @ p["w"] + p["b"]
    i, j, f, o = jnp.split(z, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, (new_c, new_h)


def gru_cell_init(key, in_dim: int, units: int) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"wg": glorot_uniform(k1, (in_dim + units, 2 * units)),
            "bg": jnp.ones((2 * units,)),  # TF GRUCell gate bias init 1.0
            "wc": glorot_uniform(k2, (in_dim + units, units)),
            "bc": jnp.zeros((units,))}


def gru_cell_apply(p: Dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    g = jax.nn.sigmoid(jnp.concatenate([x, h], -1) @ p["wg"] + p["bg"])
    r, u = jnp.split(g, 2, axis=-1)
    c = jnp.tanh(jnp.concatenate([x, r * h], -1) @ p["wc"] + p["bc"])
    return u * h + (1.0 - u) * c


# ---------------------------------------------------------------------------
# Unidirectional / bidirectional scans (vanilla-RNN cells)
# ---------------------------------------------------------------------------

def rnn_scan(p: Dict, xs: jnp.ndarray, h0: Optional[jnp.ndarray] = None,
             reverse: bool = False, unroll: int = 1
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a BasicRNN over time. xs: (B, T, D) -> (B, T, U), final h.

    TPU optimization: h' = tanh([x,h] @ W) == tanh(x @ W_x + h @ W_h + b),
    so the input projection for ALL timesteps is hoisted out of the scan
    into one large MXU matmul; the recurrence only carries the small
    h @ W_h product.  Identical math, ~D/(D+U) of the FLOPs de-serialized.
    """
    B = xs.shape[0]
    units = p["b"].shape[0]
    in_dim = xs.shape[-1]
    if h0 is None:
        h0 = jnp.zeros((B, units), xs.dtype)
    w_x, w_h = p["w"][:in_dim], p["w"][in_dim:]
    xw = jnp.swapaxes(xs, 0, 1) @ w_x + p["b"]  # (T, B, U), one big matmul

    def step(h, xw_t):
        h = jnp.tanh(xw_t + h @ w_h)
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1), hT


def birnn_init(key, in_dim: int, units: int) -> Dict:
    kf, kb = jax.random.split(key)
    return {"fw": rnn_cell_init(kf, in_dim, units),
            "bw": rnn_cell_init(kb, in_dim, units)}


def birnn_apply(p: Dict, xs: jnp.ndarray, unroll: int = 1
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional vanilla RNN, fw+bw fused into one scan over a (2B)
    stacked batch, with the input projection for every timestep hoisted
    into one large MXU matmul before the scan (see rnn_scan).

    Matches tf.nn.bidirectional_dynamic_rnn without sequence_length
    (las/layers.py:49-53): the backward pass runs over the full padded
    sequence reversed.  Returns (B, T, 2U) concat outputs and final states.
    """
    B, T, D = xs.shape
    units = p["fw"]["b"].shape[0]
    xs_t = jnp.swapaxes(xs, 0, 1)                         # (T, B, D)
    w_h = jnp.stack([p["fw"]["w"][D:], p["bw"]["w"][D:]])            # (2,U,U)

    # input projections for all timesteps, both directions: two big matmuls
    xw_fw = xs_t @ p["fw"]["w"][:D] + p["fw"]["b"]        # (T, B, U)
    xw_bw = jnp.flip(xs_t, axis=0) @ p["bw"]["w"][:D] + p["bw"]["b"]
    xw = jnp.concatenate([xw_fw, xw_bw], axis=1)          # (T, 2B, U)
    h0 = jnp.zeros((2 * B, units), xs.dtype)

    def step(h, xw_t):
        hh = jnp.einsum("dbu,duv->dbv", h.reshape(2, B, units), w_h)
        h = jnp.tanh(xw_t + hh.reshape(2 * B, units))
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw, unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)                           # (2B, T, U)
    out_fw, out_bw = ys[:B], jnp.flip(ys[B:], axis=1)
    return jnp.concatenate([out_fw, out_bw], -1), (hT[:B], hT[B:])


# ---------------------------------------------------------------------------
# Conv2D + BatchNorm
# ---------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, k: int = 3) -> Dict:
    """N(0,1)*0.01 weights, 0.01 bias (reference: las/layers.py:99-103)."""
    w = jax.random.normal(key, (k, k, in_ch, out_ch)) * 0.01
    return {"w": w, "b": jnp.full((out_ch,), 0.01)}


def conv2d_apply(p: Dict, x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """NHWC conv, SAME padding, no activation (caller applies BN/ReLU)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def bn_init(dim: int) -> Tuple[Dict, Dict]:
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def bn_apply(params: Dict, state: Dict, x: jnp.ndarray, is_training: bool,
             momentum: float = 0.99, eps: float = 1e-3):
    """tf.layers.batch_normalization semantics over the last axis.

    Batch statistics and the moving-average state are always float32,
    independent of the compute dtype (bf16 inputs would otherwise degrade
    the running estimates)."""
    if is_training:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        var = jnp.var(xf, axes)
        new_state = {"mean": momentum * state["mean"] + (1 - momentum) * mean,
                     "var": momentum * state["var"] + (1 - momentum) * var}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = ((x - mean.astype(x.dtype))
         * jax.lax.rsqrt(var + eps).astype(x.dtype)
         * params["scale"] + params["bias"])
    return y, new_state


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(key, x: jnp.ndarray, rate: float, is_training: bool) -> jnp.ndarray:
    if not is_training or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Length masking
# ---------------------------------------------------------------------------

def length_mask(lengths: jnp.ndarray, padded_len: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """(B,) -> (B, T) 1/0 mask (reference: las/layers.py:172-197)."""
    pos = jnp.arange(1, padded_len + 1)[None, :]
    return (pos <= lengths[:, None].astype(jnp.int32)).astype(dtype)
