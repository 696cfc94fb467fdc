"""Pallas TPU kernel: the WHOLE acoustic frontend fused per utterance
(framing -> DFT -> power spectrum -> mel -> log/DCT -> masked CMVN ->
derivative stacking), with an overlap-reuse DFT that does ~5x less MXU
work than the naive framed matmul.

Design (one grid step = one utterance, everything VMEM-resident):

1.  **Shared-subsegment DFT.** Frames overlap flen/fstride = 2.5x, so the
    naive (T, flen) @ (flen, K) DFT recomputes every sample's
    contribution 2.5x.  Instead the signal is cut into g-sample
    subsegments (g = gcd(flen, fstride) = 80): each frame is J = flen/g
    consecutive subsegments, and
        X_t[k] = sum_j  w_N^(g*j*k) * A_(step*t+j)[k],
    where A_h is the subsegment DFT (one small (Tseg, g) @ (g, K) matmul
    per residue group) and the twiddle combine is cheap VPU work.  MXU
    FLOPs drop by flen/g = 5x; the math is exact (float reassociation
    only).
2.  **Mel-support column pruning.** The speechpy filterbank occupies only
    bins [lo, hi] (~126 of 257 at 16 kHz — the (coefficients+1) quirk plus
    the 300 Hz floor), so the DFT computes only those columns, plus two
    analytic columns (X_0 = sum x, X_{N/2} = alternating sum) that give
    the exact frame energy via Parseval:
        sum_{k=0..N/2} |X_k|^2 = (N*sum x^2 + X_0^2 + X_{N/2}^2) / 2.
    With the 2 energy columns the lane count lands exactly on 128.
3.  **Fused normalization.** Masked per-utterance CMVN (featlen comes in
    through scalar prefetch) and the speechpy feature-axis derivative
    stack run in VMEM on the (T, D) features; the only HBM traffic is
    raw audio in and the final (T, 3D) features out — the XLA path
    (ops/frontend.py) materializes the 2.5x-inflated frame matrix and
    the intermediate feature tensors in HBM between kernels.

Static frame budgets up to MAX_FRAMES (= 1710, exactly the reference's
training MAXLEN, create_tfrecord.py:28) run fully fused per utterance;
longer utterances (e.g. 36 s eval buckets) run the SAME kernel over time
chunks with whole-utterance CMVN/deltas in XLA (fused_frontend_chunked;
routed by ops/frontend.extract_features) — no length limit.

Reference semantics preserved bit-close (tests/test_pallas_frontend.py,
tests/test_frontend_golden.py): 1/N power scaling, zero->eps handling,
c0 = log(total energy), CMVN eps 2^-30, derivative quirk
(speechpy conventions; reference preprocess.py:72-86).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS_ZERO = float(np.finfo(np.float64).eps)
EPS_CMVN = 2.0 ** -30
# Whole-utterance VMEM budget.  Empirically validated on TPU v5e against
# the 16 MB scoped-VMEM limit: T=1710 (the reference's training MAXLEN,
# create_tfrecord.py:28) compiles and runs; T=1800 is rejected by the
# compiler (live set ~20 MB).  Longer utterances chunk (see
# fused_frontend_chunked) with CHUNK_FRAMES sized well under the limit.
MAX_FRAMES = 1710
CHUNK_FRAMES = 1024
_LANE = 128


from ..utils.numerics import cdiv as _cdiv


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@functools.lru_cache(maxsize=8)
def _plan(flen: int, fstride: int, fft_length: int, feat_dim: int,
          feat_type: str, num_mel_filters: int, sample_rate: int):
    """Constant matrices for the fused kernel (NumPy, cached).

    Returns dict with: g, J, step, K (=lanes), i0/i1 (energy cols),
    C/S (g, K) subsegment DFT, PC/PS (J, K) twiddles, MEL (K, F),
    DCT (F, feat_dim).
    """
    from . import frontend_host as host

    assert fft_length % 2 == 0
    g = math.gcd(flen, fstride)
    assert g % 2 == 0, "subsegment length must be even for the X_{N/2} column"
    J, step = flen // g, fstride // g

    n_filters = num_mel_filters if feat_type == "mfcc" else feat_dim
    fb = host.mel_filterbank(n_filters, fft_length // 2 + 1, sample_rate,
                             0, sample_rate / 2)          # (F, coeffs)
    support = np.nonzero(fb.sum(axis=0))[0]
    lo, hi = int(support.min()), int(support.max())
    Ksup = hi - lo + 1
    K = _round_up(Ksup + 2, _LANE)
    i0, i1 = Ksup, Ksup + 1                                # energy columns

    n = np.arange(g)[:, None]
    k_bins = np.arange(lo, hi + 1)[None, :]
    ang = 2.0 * np.pi * n * k_bins / fft_length
    C = np.zeros((g, K), np.float32)
    S = np.zeros((g, K), np.float32)
    C[:, :Ksup] = np.cos(ang)
    S[:, :Ksup] = np.sin(ang)
    C[:, i0] = 1.0                                         # X_0 column
    C[:, i1] = np.where(np.arange(g) % 2 == 0, 1.0, -1.0)  # X_{N/2} column

    j = np.arange(J)[:, None]
    phi = 2.0 * np.pi * g * j * k_bins / fft_length        # (J, Ksup)
    PC = np.zeros((J, K), np.float32)
    PS = np.zeros((J, K), np.float32)
    PC[:, :Ksup] = np.cos(phi)
    PS[:, :Ksup] = np.sin(phi)
    PC[:, i0] = 1.0
    PC[:, i1] = 1.0   # w^(g*j*N/2) = (-1)^(g*j) = 1 for even g

    MEL = np.zeros((K, n_filters), np.float32)
    MEL[:Ksup, :] = fb.T[lo:hi + 1, :]
    DCT = (host.dct_matrix(n_filters, feat_dim).astype(np.float32)
           if feat_type == "mfcc" else np.zeros((n_filters, feat_dim),
                                                np.float32))
    return dict(g=g, J=J, step=step, K=K, i0=i0, i1=i1, Ksup=Ksup,
                C=C, S=S, PC=PC, PS=PS, MEL=MEL, DCT=DCT)


def _deltas(x: jnp.ndarray) -> jnp.ndarray:
    """speechpy feature-axis derivative (edge-padded lanes):
    (x[j+1] - x[j-1] + 2 x[j+2] - x[j-2]) / 10 on (T, D)."""
    D = x.shape[-1]
    p = jnp.concatenate([x[:, :1], x[:, :1], x, x[:, D - 1:], x[:, D - 1:]],
                        axis=1)
    return (p[:, 3:3 + D] - p[:, 1:1 + D]
            + 2.0 * p[:, 4:4 + D] - p[:, 0:D]) / 10.0


def _fused_kernel(featlen_ref, *refs, plan, T_pad: int, fft_length: int,
                  feat_type: str, apply_cmvn: bool, feat_dim: int):
    seg_refs = refs[:plan["step"]]
    C_ref, S_ref, PC_ref, PS_ref, MEL_ref, DCT_ref, out_ref = \
        refs[plan["step"]:]
    step, J, K = plan["step"], plan["J"], plan["K"]
    N = float(fft_length)
    hp = jax.lax.Precision.HIGHEST

    Ac, As, q = [], [], []
    for r in range(step):
        seg = seg_refs[r][0]                         # (Tseg, g)
        Ac.append(jnp.dot(seg, C_ref[:], preferred_element_type=jnp.float32,
                          precision=hp))
        As.append(jnp.dot(seg, S_ref[:], preferred_element_type=jnp.float32,
                          precision=hp))
        q.append(jnp.sum(seg * seg, axis=1, keepdims=True))  # (Tseg, 1)

    Xre = jnp.zeros((T_pad, K), jnp.float32)
    Xim = jnp.zeros((T_pad, K), jnp.float32)
    E = jnp.zeros((T_pad, 1), jnp.float32)
    for j in range(J):
        r, off = j % step, j // step
        ac = Ac[r][off:off + T_pad]
        as_ = As[r][off:off + T_pad]
        pc = PC_ref[j:j + 1, :]
        ps_ = PS_ref[j:j + 1, :]
        Xre = Xre + ac * pc - as_ * ps_
        Xim = Xim + ac * ps_ + as_ * pc
        E = E + q[r][off:off + T_pad]

    ps = (Xre * Xre + Xim * Xim) * (1.0 / N)          # (T_pad, K)
    # Parseval: ps energy cols hold X_0^2/N and X_{N/2}^2/N
    energy = 0.5 * E[:, 0] + 0.5 * (ps[:, plan["i0"]] + ps[:, plan["i1"]])

    mel = jnp.dot(ps, MEL_ref[:], preferred_element_type=jnp.float32,
                  precision=hp)
    mel = jnp.where(mel == 0, EPS_ZERO, mel)
    if feat_type == "mfcc":
        feat = jnp.dot(jnp.log(mel), DCT_ref[:],
                       preferred_element_type=jnp.float32, precision=hp)
        energy = jnp.where(energy == 0, EPS_ZERO, energy)
        feat = jnp.concatenate([jnp.log(energy)[:, None], feat[:, 1:]],
                               axis=1)
    else:
        feat = mel                                    # (T_pad, D)

    if apply_cmvn:
        fl = featlen_ref[pl.program_id(0)]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (T_pad, 1), 0)
                < fl).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(feat * mask, axis=0, keepdims=True) / n
        cen = (feat - mean) * mask
        var = jnp.sum(cen * cen, axis=0, keepdims=True) / n
        fn = cen / (jnp.sqrt(var) + EPS_CMVN)
        d1 = _deltas(fn)
        d2 = _deltas(d1)
        out_ref[0] = jnp.concatenate([fn, d1, d2], axis=1)  # (T_pad, 3D)
    else:
        out_ref[0] = feat


@functools.partial(
    jax.jit,
    static_argnames=("flen", "fstride", "fft_length", "feat_dim",
                     "feat_type", "num_mel_filters", "sample_rate",
                     "frames_max", "apply_cmvn", "interpret"))
def fused_frontend(audio: jnp.ndarray, featlen: jnp.ndarray, *, flen: int,
                   fstride: int, fft_length: int, feat_dim: int,
                   feat_type: str, num_mel_filters: int, sample_rate: int,
                   frames_max: int, apply_cmvn: bool,
                   interpret: bool = False) -> jnp.ndarray:
    """(B, S) padded audio + (B,) frame counts -> (B, frames_max, 3*D)
    CMVN'd+delta-stacked features ((B, frames_max, D) raw if cmvn off)."""
    plan = _plan(flen, fstride, fft_length, feat_dim, feat_type,
                 num_mel_filters, sample_rate)
    g, J, step = plan["g"], plan["J"], plan["step"]
    B, S = audio.shape
    T_pad = _round_up(max(frames_max, 8), 8)
    Tseg = _round_up(T_pad + _cdiv(J - 1, step), 8)
    need = g * step * (Tseg + 1)                     # what the reshape reads
    audio = jnp.pad(audio.astype(jnp.float32), ((0, 0), (0, max(0, need - S))))
    subs = audio[:, :g * step * (Tseg + 1)].reshape(B, Tseg + 1, step * g)
    segs = [subs[:, :Tseg, r * g:(r + 1) * g] for r in range(step)]

    kernel = functools.partial(
        _fused_kernel, plan=plan, T_pad=T_pad, fft_length=fft_length,
        feat_type=feat_type, apply_cmvn=apply_cmvn, feat_dim=feat_dim)
    out_dim = 3 * feat_dim if apply_cmvn else feat_dim
    full = lambda b, *_: (0, 0)
    consts = [plan["C"], plan["S"], plan["PC"], plan["PS"], plan["MEL"],
              plan["DCT"]]
    Ksup_f = plan["MEL"].shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Tseg, g), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * step + [
            pl.BlockSpec(c.shape, full, memory_space=pltpu.VMEM)
            for c in consts],
        out_specs=pl.BlockSpec((1, T_pad, out_dim), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T_pad, out_dim), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (step * Tseg * g * plan["K"]
                           + T_pad * plan["K"] * Ksup_f
                           + T_pad * Ksup_f * feat_dim),
            bytes_accessed=4 * B * (step * Tseg * g + T_pad * out_dim),
            transcendentals=B * T_pad * (Ksup_f + 1),
        ),
    )(featlen.astype(jnp.int32), *segs, *[jnp.asarray(c) for c in consts])
    return feats[:, :frames_max]


def suitable(frames_max: int) -> bool:
    """Whether the fully fused whole-utterance kernel applies (VMEM
    budget).  Longer utterances use fused_frontend_chunked: same kernel
    over time chunks + XLA CMVN/deltas (ops/frontend.py routes).  The
    non-TPU fallback is decided by the caller (extract_features_cfg
    keeps CPU production paths on XLA; tests force interpret mode)."""
    return frames_max <= MAX_FRAMES


def fused_frontend_chunked(audio: jnp.ndarray, *, flen: int, fstride: int,
                           fft_length: int, feat_dim: int, feat_type: str,
                           num_mel_filters: int, sample_rate: int,
                           frames_max: int, interpret: bool = False):
    """Raw features for utterances beyond the whole-utterance VMEM budget.

    The signal is cut into nc = ceil(frames_max / CHUNK_FRAMES) chunks of
    Tc frames; chunk i's sample window [i*Tc*fstride, i*Tc*fstride + Sc)
    covers its Tc frames exactly (frame t lands at the same samples as in
    the unchunked layout, so the math is IDENTICAL — only flen - fstride
    boundary samples are read twice).  Each chunk runs the fused kernel
    with apply_cmvn=False on a (B*nc,) grid; per-utterance CMVN and the
    derivative stack — which need whole-utterance statistics but are
    cheap bandwidth-bound work — run in XLA afterwards (the caller,
    ops/frontend.extract_features, reuses its masked_cmvn path).

    Returns (B, frames_max, feat_dim) raw features.
    """
    B, S = audio.shape
    nc = _cdiv(frames_max, CHUNK_FRAMES)
    Tc = _round_up(_cdiv(frames_max, nc), 8)
    Sc = (Tc - 1) * fstride + flen
    starts = np.arange(nc) * Tc * fstride
    need = int(starts[-1] + Sc)
    audio = jnp.pad(audio.astype(jnp.float32),
                    ((0, 0), (0, max(0, need - S))))
    idx = starts[:, None] + np.arange(Sc)[None, :]          # (nc, Sc)
    chunks = audio[:, idx].reshape(B * nc, Sc)
    feat = fused_frontend(
        chunks, jnp.zeros((B * nc,), jnp.int32), flen=flen,
        fstride=fstride, fft_length=fft_length, feat_dim=feat_dim,
        feat_type=feat_type, num_mel_filters=num_mel_filters,
        sample_rate=sample_rate, frames_max=Tc, apply_cmvn=False,
        interpret=interpret)                                 # (B*nc, Tc, D)
    return feat.reshape(B, nc * Tc, feat_dim)[:, :frames_max]


# Backwards-compatible name: the tiled raw-feature kernel was replaced by
# the fused whole-utterance kernel in round 2.
def pallas_frontend(*args, **kw):  # pragma: no cover - compat shim
    raise NotImplementedError(
        "pallas_frontend was replaced by fused_frontend (round 2); "
        "use ops.frontend.extract_features(use_pallas=True)")
