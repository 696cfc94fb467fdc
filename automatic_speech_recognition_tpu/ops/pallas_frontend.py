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
# Grid dimension semantics: "parallel" measured faster than "arbitrary"
# on v5e for this kernel (within-process A/B, benchmarks/frontend_probe.py);
# module-level so the probe can flip it per-variant.
_SEMANTICS = "parallel"
# Folded DFT: fold the twiddle factors into per-position subsegment bases
# (CJ/SJ) so X accumulates directly from J matmuls — no Ac/As VMEM
# intermediates, no VPU twiddle combine.  Measured SLOWER on v5e (3.62 vs
# 2.09 ms/batch): the kernel is MXU-bound, and folding does flen/fstride x
# more MXU FLOPs.  Kept switchable for the probe's A/B record.
_FOLDED = False
# bf16x4 DFT matmuls: split operands into bf16 hi+lo and run 4 single-pass
# bf16 matmuls (all hi/lo cross products) with f32 accumulation — 2/3 the
# MXU passes of f32 HIGHEST (6x bf16), error ~1e-5 relative (golden-test
# tolerance is 2e-4; measured max abs err vs XLA below it).
_BF16X4 = True


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

    # Folded DFT basis: CJ[j] = cos(2*pi*(n + g*j)*k / N) (g, K) per
    # subsegment position j, i.e. the twiddle factors folded INTO the
    # subsegment basis so X = sum_j seg_slice_j @ CJ[j] directly — no
    # Ac/As intermediates, no VPU combine (see _fused_kernel).
    jj = np.arange(J)[None, :, None]                       # (1, J, 1)
    ang_full = 2.0 * np.pi * (n[:, None, :] + g * jj) * \
        k_bins[None, :, :] / fft_length                    # (g, J, Ksup)
    CJ = np.zeros((J, g, K), np.float32)
    SJ = np.zeros((J, g, K), np.float32)
    CJ[:, :, :Ksup] = np.transpose(np.cos(ang_full), (1, 0, 2))
    SJ[:, :, :Ksup] = np.transpose(np.sin(ang_full), (1, 0, 2))
    CJ[:, :, i0] = 1.0                                     # k = 0
    CJ[:, :, i1] = np.where(np.arange(g)[None, :] % 2 == 0, 1.0,
                            -1.0)                          # k = N/2, g even

    def split(M):  # bf16 hi/lo decomposition for 3-pass f32 matmul
        import ml_dtypes
        hi = M.astype(ml_dtypes.bfloat16)
        lo = (M - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo

    C_hi, C_lo = split(C)
    S_hi, S_lo = split(S)
    return dict(g=g, J=J, step=step, K=K, i0=i0, i1=i1, Ksup=Ksup,
                C=C, S=S, PC=PC, PS=PS, MEL=MEL, DCT=DCT, CJ=CJ, SJ=SJ,
                C_hi=C_hi, C_lo=C_lo, S_hi=S_hi, S_lo=S_lo)


def _deltas(x: jnp.ndarray) -> jnp.ndarray:
    """speechpy feature-axis derivative (edge-padded lanes):
    (x[j+1] - x[j-1] + 2 x[j+2] - x[j-2]) / 10 on (T, D)."""
    D = x.shape[-1]
    p = jnp.concatenate([x[:, :1], x[:, :1], x, x[:, D - 1:], x[:, D - 1:]],
                        axis=1)
    return (p[:, 3:3 + D] - p[:, 1:1 + D]
            + 2.0 * p[:, 4:4 + D] - p[:, 0:D]) / 10.0


def _fused_kernel(featlen_ref, *refs, plan, T_pad: int, fft_length: int,
                  feat_type: str, apply_cmvn: bool, feat_dim: int, U: int,
                  Tseg: int):
    seg_refs = refs[:plan["step"]]
    if _FOLDED:
        CJ_ref, SJ_ref, MEL_ref, DCT_ref, out_ref = refs[plan["step"]:]
    elif _BF16X4:
        (Chi_ref, Clo_ref, Shi_ref, Slo_ref, PC_ref, PS_ref, MEL_ref,
         DCT_ref, out_ref) = refs[plan["step"]:]
    else:
        C_ref, S_ref, PC_ref, PS_ref, MEL_ref, DCT_ref, out_ref = \
            refs[plan["step"]:]
    step, J, K = plan["step"], plan["J"], plan["K"]
    N = float(fft_length)
    hp = jax.lax.Precision.HIGHEST

    def dot3(a_hi, a_lo, b_hi, b_lo):
        """4-pass bf16 emulation of an f32 matmul (bf16x4: all four
        hi/lo cross products) — 2/3 the MXU passes of precision=HIGHEST.
        The 3-pass form (lo*lo dropped) left a 3.5e-4 tail error on long
        utterances, past the golden tolerance; with the lo*lo pass the
        worst element on the 36 s chunked shape measures 2.3e-4, inside
        the golden envelope (atol 2e-4 + rtol 1e-4*|x|, and the typical
        error is ~8e-5 — tests/test_pallas_frontend.py)."""
        f32 = jnp.float32
        return (jnp.dot(a_hi, b_hi, preferred_element_type=f32)
                + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
                + (jnp.dot(a_lo, b_hi, preferred_element_type=f32)
                   + jnp.dot(a_lo, b_lo, preferred_element_type=f32)))

    # Per-utterance subsegment DFT (U utterances per grid step amortizes
    # grid/DMA overhead; keeping the matmuls per-utterance lets Mosaic
    # free each utterance's Ac/As before the next — the merged (U*Tseg)
    # form kept U x (Tseg, K) intermediates live and blew VMEM at U=2).
    for u in range(U):
        Ac, As, q = [], [], []
        if _FOLDED:
            # X accumulates straight off the MXU: frame t's DFT is
            #   X_t[k] = sum_j seg_{r(j)}[t + off_j] . CJ[j][:, k]
            # (CJ/SJ carry the twiddles; see _plan).  Measured MXU-bound
            # slower than the shared-subsegment form; kept for the A/B.
            Xre = jnp.zeros((T_pad, K), jnp.float32)
            Xim = jnp.zeros((T_pad, K), jnp.float32)
            E = jnp.zeros((T_pad, 1), jnp.float32)
            qu = [jnp.sum(seg_refs[r][u] * seg_refs[r][u], axis=1,
                          keepdims=True) for r in range(step)]
            for j in range(J):
                r, off = j % step, j // step
                sl = seg_refs[r][u, off:off + T_pad]     # (T_pad, g)
                Xre = Xre + jnp.dot(sl, CJ_ref[j],
                                    preferred_element_type=jnp.float32,
                                    precision=hp)
                Xim = Xim + jnp.dot(sl, SJ_ref[j],
                                    preferred_element_type=jnp.float32,
                                    precision=hp)
                E = E + qu[r][off:off + T_pad]
        else:
            for r in range(step):
                seg = seg_refs[r][u]                     # (Tseg, g)
                if _BF16X4:
                    sh = seg.astype(jnp.bfloat16)
                    sl = (seg - sh.astype(jnp.float32)).astype(jnp.bfloat16)
                    Ac.append(dot3(sh, sl, Chi_ref[:], Clo_ref[:]))
                    As.append(dot3(sh, sl, Shi_ref[:], Slo_ref[:]))
                else:
                    Ac.append(jnp.dot(seg, C_ref[:],
                                      preferred_element_type=jnp.float32,
                                      precision=hp))
                    As.append(jnp.dot(seg, S_ref[:],
                                      preferred_element_type=jnp.float32,
                                      precision=hp))
                q.append(jnp.sum(seg * seg, axis=1, keepdims=True))

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
            fl = featlen_ref[pl.program_id(0) * U + u]
            mask = (jax.lax.broadcasted_iota(jnp.int32, (T_pad, 1), 0)
                    < fl).astype(jnp.float32)
            n = jnp.maximum(jnp.sum(mask), 1.0)
            mean = jnp.sum(feat * mask, axis=0, keepdims=True) / n
            cen = (feat - mean) * mask
            var = jnp.sum(cen * cen, axis=0, keepdims=True) / n
            fn = cen / (jnp.sqrt(var) + EPS_CMVN)
            d1 = _deltas(fn)
            d2 = _deltas(d1)
            out_ref[u] = jnp.concatenate([fn, d1, d2], axis=1)  # (T_pad, 3D)
        else:
            out_ref[u] = feat


def _pick_utts_per_step(T_pad: int, Tseg: int, K: int, g: int, step: int,
                        B: int, out_dim: int, const_bytes: int) -> int:
    """Largest U (utterances per grid step) whose VMEM live set fits.

    Per-U bytes: seg input blocks (double-buffered) and the lane-padded
    output block — padded to the REAL lane-rounded out_dim, not one lane
    tile (fbank with feat_dim >= 43 under CMVN gives 3*feat_dim > 128,
    where a fixed-_LANE model undercounts and overshoots U).  The
    per-utterance working set (Ac/As, Xre/Xim, ps, slices, Mosaic
    copies) is live for ONE utterance at a time — the kernel computes
    utterances sequentially — so it is a fixed pool, plus the resident
    constant blocks (whose footprint differs between the FOLDED /
    bf16x4 / f32 variants; const_bytes carries the actual total).
    Budget 9 MB of the 16 MB scoped VMEM, empirically calibrated on v5e:
    U=2 at T=1000 compiles and runs, the earlier merged-matmul form
    (which kept U x Ac/As live) was rejected at the same shape."""
    per_u = 4 * (2 * step * Tseg * g       # seg blocks, double-buffered
                 + T_pad * _round_up(out_dim, _LANE))  # output block
    fixed = const_bytes + 4 * (
        4 * Tseg * K                       # Ac/As (cos+sin per residue)
        + 6 * T_pad * K)                   # Xre/Xim/ps/slices/copies
    budget = 9 * 1024 * 1024
    for u in (8, 4, 2):
        if u <= B and fixed + u * per_u <= budget:
            return u
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("flen", "fstride", "fft_length", "feat_dim",
                     "feat_type", "num_mel_filters", "sample_rate",
                     "frames_max", "apply_cmvn", "interpret",
                     "utts_per_step"))
def fused_frontend(audio: jnp.ndarray, featlen: jnp.ndarray, *, flen: int,
                   fstride: int, fft_length: int, feat_dim: int,
                   feat_type: str, num_mel_filters: int, sample_rate: int,
                   frames_max: int, apply_cmvn: bool,
                   interpret: bool = False,
                   utts_per_step: int = 0) -> jnp.ndarray:
    """(B, S) padded audio + (B,) frame counts -> (B, frames_max, 3*D)
    CMVN'd+delta-stacked features ((B, frames_max, D) raw if cmvn off).

    utts_per_step: utterances per grid step (0 = auto from VMEM budget).
    """
    plan = _plan(flen, fstride, fft_length, feat_dim, feat_type,
                 num_mel_filters, sample_rate)
    g, J, step = plan["g"], plan["J"], plan["step"]
    B, S = audio.shape
    T_pad = _round_up(max(frames_max, 8), 8)
    Tseg = _round_up(T_pad + _cdiv(J - 1, step), 8)
    out_dim = 3 * feat_dim if apply_cmvn else feat_dim
    if _FOLDED:
        consts = [plan["CJ"], plan["SJ"], plan["MEL"], plan["DCT"]]
    elif _BF16X4:
        consts = [plan["C_hi"], plan["C_lo"], plan["S_hi"], plan["S_lo"],
                  plan["PC"], plan["PS"], plan["MEL"], plan["DCT"]]
    else:
        consts = [plan["C"], plan["S"], plan["PC"], plan["PS"],
                  plan["MEL"], plan["DCT"]]
    const_bytes = sum(int(np.prod(c.shape)) * c.dtype.itemsize
                      for c in consts)
    U = utts_per_step or _pick_utts_per_step(T_pad, Tseg, plan["K"], g,
                                             step, B, out_dim, const_bytes)
    B_pad = _round_up(B, U)
    need = g * step * (Tseg + 1)                     # what the reshape reads
    audio = jnp.pad(audio.astype(jnp.float32),
                    ((0, B_pad - B), (0, max(0, need - S))))
    featlen = jnp.pad(featlen.astype(jnp.int32), (0, B_pad - B))
    subs = audio[:, :g * step * (Tseg + 1)].reshape(B_pad, Tseg + 1, step * g)
    segs = [subs[:, :Tseg, r * g:(r + 1) * g] for r in range(step)]

    kernel = functools.partial(
        _fused_kernel, plan=plan, T_pad=T_pad, fft_length=fft_length,
        feat_type=feat_type, apply_cmvn=apply_cmvn, feat_dim=feat_dim,
        U=U, Tseg=Tseg)
    full3 = lambda b, *_: (0,) * 3
    full2 = lambda b, *_: (0,) * 2
    Ksup_f = plan["MEL"].shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_pad // U,),
        in_specs=[pl.BlockSpec((U, Tseg, g), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * step + [
            pl.BlockSpec(c.shape,
                         full3 if c.ndim == 3 else full2,
                         memory_space=pltpu.VMEM)
            for c in consts],
        out_specs=pl.BlockSpec((U, T_pad, out_dim), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, T_pad, out_dim), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_SEMANTICS,)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * ((2 * J * T_pad if _FOLDED
                                else step * Tseg) * g * plan["K"]
                               + T_pad * plan["K"] * Ksup_f
                               + T_pad * Ksup_f * feat_dim),
            bytes_accessed=4 * B_pad * (step * Tseg * g + T_pad * out_dim),
            transcendentals=B_pad * T_pad * (Ksup_f + 1),
        ),
    )(featlen, *segs, *[jnp.asarray(c) for c in consts])
    return feats[:B, :frames_max]


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
