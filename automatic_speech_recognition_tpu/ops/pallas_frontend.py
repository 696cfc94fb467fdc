"""Pallas TPU kernel: fused acoustic-frontend tile
(framing -> real-DFT -> power spectrum -> mel -> log -> DCT/c0).

Why a kernel: the XLA path (ops/frontend.py) materializes the framed
signal — a (B, T, flen) gather that inflates HBM traffic ~flen/fstride x
(2.5x for 25ms/10ms) before the DFT matmul reads it back.  Here each grid
step DMAs only its raw audio slice into VMEM, builds the overlapped frames
IN VMEM with static reshapes (no gather at all), and runs the whole
matmul chain (MXU) without touching HBM until the final (TF, D) feature
tile is written.

Frame construction trick: with hop `fstride` and window `flen`, the
(TF, flen) frame matrix is `ceil(flen/fstride)` NON-overlapping reshapes
of the same 1-D buffer, shifted by k*fstride and column-clipped — pure
layout ops, MXU-friendly, no dynamic indexing.

The kernel consumes two consecutive audio blocks (current + lookahead,
clamped at the end) so frames crossing the tile boundary stay in VMEM.
CMVN and the derivative stack need whole-utterance statistics and stay in
XLA (ops/frontend.masked_cmvn / stack_derivatives).

Reference semantics preserved: 1/fft_length power scaling, zero->eps
handling, c0 = log(total energy) (speechpy conventions; see
ops/frontend_host.py and reference preprocess.py:72-86).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS_ZERO = float(np.finfo(np.float64).eps)
FRAME_TILE = 128  # frames per grid step (MXU sublane-friendly)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _frontend_kernel(*refs, flen: int, fstride: int, fft_length: int,
                     feat_type: str):
    *seg_refs, cos_ref, sin_ref, mel_ref, dct_ref, out_ref = refs
    # assemble overlapped frames from the pre-shaped shifted segments
    # (Mosaic has no cross-lane reshape; the (TF, fstride) layout comes in
    # from XLA, the kernel only concatenates lanes)
    parts = []
    for k, s in enumerate(seg_refs):
        width = min(fstride, flen - k * fstride)
        parts.append(s[0, :, :width])
    frames = jnp.concatenate(parts, axis=1)         # (TF, flen)

    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    ps = (re * re + im * im) * (1.0 / fft_length)   # (TF, K)

    mel = jnp.dot(ps, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    mel = jnp.where(mel == 0, EPS_ZERO, mel)
    if feat_type == "mfcc":
        feat = jnp.dot(jnp.log(mel), dct_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        energy = jnp.sum(ps, axis=-1, keepdims=True)
        energy = jnp.where(energy == 0, EPS_ZERO, energy)
        feat = jnp.concatenate([jnp.log(energy), feat[:, 1:]], axis=1)
    else:  # fbank
        feat = mel
    out_ref[0, :, :] = feat


@functools.partial(
    jax.jit,
    static_argnames=("flen", "fstride", "fft_length", "feat_dim",
                     "feat_type", "num_mel_filters", "sample_rate",
                     "interpret"))
def pallas_frontend(audio: jnp.ndarray, *, flen: int, fstride: int,
                    fft_length: int, feat_dim: int, feat_type: str,
                    num_mel_filters: int, sample_rate: int = 16000,
                    interpret: bool = False) -> jnp.ndarray:
    """(B, S) padded audio -> (B, T_tiles*FRAME_TILE, feat_dim) raw features.

    Caller handles featlen masking, CMVN and derivative stacking.
    """
    B, S = audio.shape
    tile_samples = FRAME_TILE * fstride
    n_tiles = _cdiv(max(S - flen, 1), tile_samples)
    nseg = _cdiv(flen, fstride)
    pad_to = n_tiles * tile_samples + nseg * fstride  # lookahead room
    audio = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, pad_to - S)))

    # shifted segment views, pre-shaped to (B, T_pad, fstride) in XLA
    # (layout-only reshapes; see module docstring)
    T_pad = n_tiles * FRAME_TILE
    segs = [audio[:, k * fstride:k * fstride + T_pad * fstride]
            .reshape(B, T_pad, fstride) for k in range(nseg)]

    from . import frontend as _f  # shared constant-matrix builders
    C, Sm = _f._dft_matrices(flen, fft_length)
    n_filters = num_mel_filters if feat_type == "mfcc" else feat_dim
    M = _f._mel_matrix(n_filters, fft_length, sample_rate)
    D = _f._dct_matrix(n_filters, feat_dim) if feat_type == "mfcc" else \
        np.zeros((n_filters, feat_dim), np.float32)

    kernel = functools.partial(_frontend_kernel, flen=flen, fstride=fstride,
                               fft_length=fft_length, feat_type=feat_type)
    full = lambda i, j: (0, 0)
    seg_spec = pl.BlockSpec((1, FRAME_TILE, fstride), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[seg_spec] * nseg + [
            pl.BlockSpec((flen, fft_length // 2 + 1), full,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((flen, fft_length // 2 + 1), full,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_length // 2 + 1, n_filters), full,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_filters, feat_dim), full,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, feat_dim),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, feat_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_pad
            * (flen * (fft_length + 2) + (fft_length // 2 + 1) * n_filters
               + n_filters * feat_dim),
            bytes_accessed=4 * B * (nseg * pad_to + T_pad * feat_dim),
            transcendentals=B * T_pad * (n_filters + 1),
        ),
    )(*segs, jnp.asarray(C), jnp.asarray(Sm), jnp.asarray(M),
      jnp.asarray(D))
    return out


