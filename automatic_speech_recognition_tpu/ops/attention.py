"""Attention mechanisms: additive (Bahdanau) and location-aware (Chorowski).

Reference semantics (las/layers.py:165-311):
- masked softmax: energies at padded positions replaced with -1e8
- context = sum_t alpha_t * h_t
- additive: energy = u . tanh(h W_h + s W_s), u ~ Uniform(-1, 1)
- location-aware: adds W_f f where f = conv1d(prev_align, channels=
  loc_num_channels, kernel=loc_kernel_size, SAME, with bias)

TPU notes: the score is computed for the whole (B, T) at once — a single
(B*T, H) @ (H, A) matmul.  The location conv is a 1-D conv over T with ONE
input channel and 10 output channels — a shape XLA:TPU lowers badly (no
contraction dim for the MXU; measured at 37 us/decode-step, 69% of the
whole decoder scan, benchmarks/decoder_profile.py).  It is instead
evaluated as a matmul against a hoisted Toeplitz expansion of the kernel:
f[b,t,c] = sum_tau align[b,tau] * M[tau,t,c] with
M[tau,t,c] = conv_w[tau-t+pad, c] — one (B,T) @ (T, T*C) MXU matmul per
step, with M built once per forward pass (loop-invariant, so it is
hoisted out of the decoder scan / beam while_loop by the callers, like
h_proj).  Same math as the SAME conv, float-reassociation only.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import layers

NEG_INF = -1e8


def masked_attend(hidden: jnp.ndarray, energy: jnp.ndarray,
                  seqlen: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply length mask, softmax, and reduce context
    (reference: las/layers.py:199-213)."""
    T = hidden.shape[1]
    mask = layers.length_mask(seqlen, T, energy.dtype)
    energy = jnp.where(mask == 0, NEG_INF, energy)
    alphas = jax.nn.softmax(energy, axis=-1)
    # batched (1, T) @ (T, H) on the MXU — the broadcast-multiply+reduce
    # form materializes a (B, T, H) intermediate on the VPU instead
    context = jnp.einsum("bt,bth->bh", alphas, hidden)
    return context, alphas


def additive_init(key, h_dim: int, s_dim: int, att_size: int) -> Dict:
    kh, ks, ku = jax.random.split(key, 3)
    return {
        "w_h": layers.dense_init(kh, h_dim, att_size, use_bias=False),
        "w_s": layers.dense_init(ks, s_dim, att_size, use_bias=False),
        "u": jax.random.uniform(ku, (att_size,), jnp.float32, -1.0, 1.0),
    }


def precompute_hidden(p: Dict, hidden) -> jnp.ndarray:
    """hidden @ W_h, shared by every decode step (the encoder output is
    fixed during decoding, so this (B,T,H)@(H,A) matmul — the dominant
    per-step attention cost — is hoisted out of the decoder scan)."""
    return layers.dense_apply(p["w_h"], hidden)


def additive_apply(p: Dict, hidden, state, align, seqlen, h_proj=None):
    """align unused, kept for interface parity (las/layers.py:234-241)."""
    if h_proj is None:
        h_proj = precompute_hidden(p, hidden)
    v = jnp.tanh(h_proj + layers.dense_apply(p["w_s"], state)[:, None, :])
    energy = jnp.einsum("bta,a->bt", v, p["u"])
    return masked_attend(hidden, energy, seqlen)


def location_init(key, h_dim: int, s_dim: int, att_size: int,
                  kernel_size: int = 201, num_channels: int = 10) -> Dict:
    kh, ks, kf, ku, kc = jax.random.split(key, 5)
    limit = (6.0 / (kernel_size * 1 + kernel_size * num_channels)) ** 0.5
    conv_w = jax.random.uniform(kc, (kernel_size, 1, num_channels),
                                jnp.float32, -limit, limit)
    return {
        "w_h": layers.dense_init(kh, h_dim, att_size, use_bias=False),
        "w_s": layers.dense_init(ks, s_dim, att_size, use_bias=False),
        "w_f": layers.dense_init(kf, num_channels, att_size, use_bias=False),
        "u": jax.random.uniform(ku, (att_size,), jnp.float32, -1.0, 1.0),
        "conv_w": conv_w,
        "conv_b": jnp.zeros((num_channels,)),
    }


def precompute_location(p: Dict, T: int) -> jnp.ndarray:
    """Toeplitz expansion M (T, T, C) of the location conv kernel, such
    that conv1d_SAME(align, conv_w)[b,t,c] == einsum("bt,tsc->bsc",
    align, M)[b,t,c].  Depends only on params and the static T, so
    callers hoist it out of the decode loop (built once per utterance
    batch; (T, T, C) floats — 10.5 MB at T=512, C=10)."""
    w = p["conv_w"][:, 0, :]                      # (K, C)
    K = w.shape[0]
    pad_low = (K - 1) // 2                        # XLA SAME: low = (K-1)//2
    tau = jnp.arange(T)[:, None]
    t = jnp.arange(T)[None, :]
    idx = tau - t + pad_low                       # (T, T)
    valid = (idx >= 0) & (idx < K)
    safe = jnp.clip(idx, 0, K - 1)
    return jnp.where(valid[..., None], w[safe], jnp.zeros((), w.dtype))


def location_apply(p: Dict, hidden, state, align, seqlen, h_proj=None,
                   loc_proj=None):
    """Location-aware attention (las/layers.py:281-309): eq (8)-(9) of
    Chorowski et al. with f from a SAME 1-D conv over the previous
    alignment (evaluated as the hoisted Toeplitz matmul, see module
    docstring)."""
    if h_proj is None:
        h_proj = precompute_hidden(p, hidden)
    if loc_proj is None:
        loc_proj = precompute_location(p, align.shape[1])
    # one dot_general: (B, T) x (T, S, C) -> (B, S, C).  In the trained
    # scan and the beam loop the align carry already rides in the compute
    # dtype (speller_apply inits it as enc_out.dtype), so this cast is a
    # no-op there; it guards external callers (probe harnesses, notebooks)
    # that pass an f32 alignment, where a mixed f32 x bf16 dot would
    # silently promote to f32 matmul passes (~27% slower at published
    # size, measured in benchmarks/decoder_profile.py's f32-carry harness)
    f = jnp.einsum("bt,tsc->bsc", align.astype(loc_proj.dtype),
                   loc_proj) + p["conv_b"]
    v = jnp.tanh(h_proj
                 + layers.dense_apply(p["w_s"], state)[:, None, :]
                 + layers.dense_apply(p["w_f"], f))
    energy = jnp.einsum("bta,a->bt", v, p["u"])
    return masked_attend(hidden, energy, seqlen)


def attention_init(key, mode: str, h_dim: int, s_dim: int, att_size: int,
                   kernel_size: int, num_channels: int) -> Dict:
    """Dispatch like the reference Attention facade (las/las.py:39-54)."""
    if mode == "add":
        return additive_init(key, h_dim, s_dim, att_size)
    if mode == "loc":
        return location_init(key, h_dim, s_dim, att_size, kernel_size, num_channels)
    raise NotImplementedError(f"attention mode {mode}")


def attention_apply(p: Dict, mode: str, hidden, state, align, seqlen,
                    h_proj=None, loc_proj=None):
    if mode == "add":
        return additive_apply(p, hidden, state, align, seqlen, h_proj)
    if mode == "loc":
        return location_apply(p, hidden, state, align, seqlen, h_proj,
                              loc_proj)
    raise NotImplementedError(f"attention mode {mode}")
