"""On-device (JAX/TPU) fused acoustic frontend.

Replaces the reference's offline CPU speechpy loop (preprocess.py:50-91)
with a single jitted, batched program: framing -> spectrum -> mel -> log/DCT
-> masked per-utterance CMVN -> feature-axis delta stacking, producing
(B, T, D, 3) float32 like the reference pipeline.

TPU-first design notes:
- All heavy stages are matmuls that ride the MXU: the real-input DFT is two
  (frames @ cos/sin) products, the mel projection and the DCT are constant
  matrices baked at trace time.  (XLA's native FFT is also available via
  use_fft=True; the matmul path wins on TPU for the 400->257 size.)
- Static shapes: audio arrives padded to a fixed sample count; frame count
  and masks are computed from lengths with lax ops, so one compilation
  serves every utterance length.
- Numerical semantics (framing offsets, 1/512 power scaling, the
  (coefficients+1) filterbank quirk, c0 = log energy, CMVN eps 2^-30,
  feature-axis derivative) match ops/frontend_host.py bit-for-bit modulo
  float32 vs float64 rounding; tests/test_frontend.py pins the tolerance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import frontend_host as host
from ..utils.numerics import round_up

EPS_CMVN = 2.0 ** -30
EPS_ZERO = float(np.finfo(np.float64).eps)


@functools.lru_cache(maxsize=8)
def _dft_matrices(flen: int, fft_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two dense matrices: (flen, fft//2+1) cos and -sin.

    frames @ C == Re(rfft(frames, n)), frames @ S == Im(rfft(frames, n)).
    """
    n = np.arange(flen)[:, None]
    k = np.arange(fft_length // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mel_matrix(num_filters: int, fft_length: int, sample_rate: int) -> np.ndarray:
    fb = host.mel_filterbank(num_filters, fft_length // 2 + 1, sample_rate,
                             0, sample_rate / 2)
    return fb.T.astype(np.float32)  # (coefficients, num_filters)


@functools.lru_cache(maxsize=8)
def _dct_matrix(num_inputs: int, num_outputs: int) -> np.ndarray:
    return host.dct_matrix(num_inputs, num_outputs).astype(np.float32)


def frame_signal(audio: jnp.ndarray, flen: int, fstride: int,
                 frames_max: int) -> jnp.ndarray:
    """(B, S) -> (B, frames_max, flen) by strided gather (static shapes)."""
    idx = (np.arange(frames_max) * fstride)[:, None] + np.arange(flen)[None, :]
    idx = np.minimum(idx, audio.shape[-1] - 1)  # safe gather for padded tail
    return audio[:, idx]


def _power_spectrum(frames: jnp.ndarray, fft_length: int,
                    use_fft: bool) -> jnp.ndarray:
    if use_fft:
        spec = jnp.fft.rfft(frames, n=fft_length, axis=-1)
        return (spec.real ** 2 + spec.imag ** 2) * (1.0 / fft_length)
    C, S = _dft_matrices(frames.shape[-1], fft_length)
    re = jnp.einsum("btf,fk->btk", frames, jnp.asarray(C),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btf,fk->btk", frames, jnp.asarray(S),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return (re * re + im * im) * (1.0 / fft_length)


def _zero_handling(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x == 0, EPS_ZERO, x)


def masked_cmvn(feat: jnp.ndarray, featlen: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance CMVN with variance normalization over valid frames only.

    Matches speechpy.processing.cmvn(vec, True) (preprocess.py:85) on the
    unpadded utterance: population std, denominator (std + 2^-30).
    """
    T = feat.shape[1]
    mask = (jnp.arange(T)[None, :] < featlen[:, None]).astype(feat.dtype)  # (B,T)
    n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]  # (B,1,1)
    m3 = mask[..., None]
    mean = jnp.sum(feat * m3, axis=1, keepdims=True) / n
    centered = (feat - mean) * m3
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / n
    std = jnp.sqrt(var)
    return centered / (std + EPS_CMVN)


def feature_axis_deltas(feat: jnp.ndarray) -> jnp.ndarray:
    """speechpy derivative quirk on (B, T, D): edge-pad feature axis, then
    dif = 1*x[j+1] - x[j-1] + 2*x[j+2] - x[j-2], / 10."""
    p = jnp.pad(feat, ((0, 0), (0, 0), (2, 2)), mode="edge")
    D = feat.shape[-1]
    dif = (1.0 * p[..., 3:3 + D] - p[..., 1:1 + D]
           + 2.0 * p[..., 4:4 + D] - p[..., 0:D])
    return dif / 10.0


def stack_derivatives(feat: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D, 3) static + d + dd."""
    d1 = feature_axis_deltas(feat)
    d2 = feature_axis_deltas(d1)
    return jnp.stack([feat, d1, d2], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "frame_length_ms", "frame_step_ms",
                     "feat_dim", "feat_type", "apply_cmvn", "fft_length",
                     "num_mel_filters", "frames_max", "use_fft",
                     "use_pallas"))
def extract_features(audio: jnp.ndarray, audiolen: jnp.ndarray, *,
                     sample_rate: int = 16000, frame_length_ms: int = 25,
                     frame_step_ms: int = 10, feat_dim: int = 13,
                     feat_type: str = "mfcc", apply_cmvn: bool = True,
                     fft_length: int = 512, num_mel_filters: int = 40,
                     frames_max: int = 0, use_fft: bool = False,
                     use_pallas: bool = False):
    """Batched feature extraction.

    Args:
      audio:    (B, S) float32 padded waveforms.
      audiolen: (B,) int32 valid sample counts.
      frames_max: static output frame count; 0 = derive from S.

    Returns:
      feats:   (B, frames_max, feat_dim, 3) float32 (cmvn on), else
               (B, frames_max, feat_dim) raw features.
      featlen: (B,) int32 valid frame counts, floor((len-flen)/stride).
    """
    flen, fstride = host.frame_params(sample_rate, frame_length_ms, frame_step_ms)
    S = audio.shape[-1]
    if frames_max <= 0:
        frames_max = max(host.num_frames(S, flen, fstride), 1)
    featlen = jnp.maximum((audiolen - flen) // fstride, 0).astype(jnp.int32)
    featlen = jnp.minimum(featlen, frames_max)

    if use_pallas:
        from . import pallas_frontend as pk
        interpret = jax.default_backend() != "tpu"
        if pk.suitable(frames_max):
            feat = pk.fused_frontend(
                audio.astype(jnp.float32), featlen, flen=flen,
                fstride=fstride, fft_length=fft_length, feat_dim=feat_dim,
                feat_type=feat_type, num_mel_filters=num_mel_filters,
                sample_rate=sample_rate, frames_max=frames_max,
                apply_cmvn=apply_cmvn, interpret=interpret)
            if apply_cmvn:
                # kernel emits (B, T, 3D) = [static | d1 | d2] along lanes
                B, T = feat.shape[:2]
                feat = jnp.transpose(feat.reshape(B, T, 3, feat_dim),
                                     (0, 1, 3, 2))
            return feat, featlen
        # beyond the whole-utterance VMEM budget: same kernel over time
        # chunks for the matmul stages, then fall through to the shared
        # whole-utterance CMVN/deltas tail below (one implementation for
        # the chunked-Pallas and XLA paths)
        feat = pk.fused_frontend_chunked(
            audio.astype(jnp.float32), flen=flen, fstride=fstride,
            fft_length=fft_length, feat_dim=feat_dim, feat_type=feat_type,
            num_mel_filters=num_mel_filters, sample_rate=sample_rate,
            frames_max=frames_max, interpret=interpret)
        return _cmvn_tail(feat, featlen, frames_max, apply_cmvn)

    frames = frame_signal(audio.astype(jnp.float32), flen, fstride, frames_max)
    ps = _power_spectrum(frames, fft_length, use_fft)            # (B,T,K)

    if feat_type == "mfcc":
        mel = jnp.einsum("btk,kf->btf", ps, jnp.asarray(
            _mel_matrix(num_mel_filters, fft_length, sample_rate)),
            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        logmel = jnp.log(_zero_handling(mel))
        feat = jnp.einsum("btf,fc->btc", logmel, jnp.asarray(
            _dct_matrix(num_mel_filters, feat_dim)),
            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        energy = _zero_handling(jnp.sum(ps, axis=-1))
        feat = feat.at[..., 0].set(jnp.log(energy))              # dc_elimination
    elif feat_type == "fbank":
        mel = jnp.einsum("btk,kf->btf", ps, jnp.asarray(
            _mel_matrix(feat_dim, fft_length, sample_rate)),
            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        feat = _zero_handling(mel)
    else:
        raise ValueError(f"unknown feat_type: {feat_type}")

    return _cmvn_tail(feat, featlen, frames_max, apply_cmvn)


def _cmvn_tail(feat, featlen, frames_max: int, apply_cmvn: bool):
    """Shared normalization tail: per-utterance CMVN + derivative stack
    + padded-frame zeroing (or the raw features verbatim)."""
    if apply_cmvn:
        feat = masked_cmvn(feat, featlen)
        feat = stack_derivatives(feat)
        # zero out padded frames entirely
        mask = (jnp.arange(frames_max)[None, :] < featlen[:, None])
        feat = feat * mask[:, :, None, None].astype(feat.dtype)
    return feat, featlen


def extract_features_cfg(audio, audiolen, cfg, frames_max: int = 0):
    """Config-driven wrapper.  cfg.use_pallas selects the fused kernel on
    TPU only — on CPU backends the kernel would run in (slow) interpret
    mode, so production paths fall back to XLA there; tests force the
    kernel explicitly via extract_features(use_pallas=True)."""
    return extract_features(
        audio, audiolen,
        sample_rate=cfg.sample_rate, frame_length_ms=cfg.frame_length,
        frame_step_ms=cfg.frame_step, feat_dim=cfg.feat_dim,
        feat_type=cfg.feat_type, apply_cmvn=cfg.cmvn,
        fft_length=cfg.fft_length, num_mel_filters=cfg.num_mel_filters,
        frames_max=frames_max,
        use_pallas=cfg.use_pallas and jax.default_backend() == "tpu")


def featurize_batch(sig, siglen, cfg):
    """In-dispatch featurization for cfg.audio_shards: a loader batch of
    raw waveforms (B, S, 1, 1) (or already-flat (B, S)) -> the feature
    batch the model consumes ((B, T, D, 3) cmvn / (B, T, D, 1) raw) plus
    frame counts.  Called INSIDE the jitted train step / eval dispatch:
    featurization and the model run as ONE compiled program, so features
    never cross the host boundary or touch disk (they do materialize in
    HBM between the frontend and encoder ops — XLA fuses the elementwise
    tail, not the matmul chain).

    Always the XLA path: the Pallas kernel is a custom call GSPMD cannot
    partition, and the train step is compiled over the device mesh."""
    if sig.ndim == 4:
        sig = sig[:, :, 0, 0]
    feat, featlen = extract_features(
        sig, siglen.astype(jnp.int32),
        sample_rate=cfg.sample_rate, frame_length_ms=cfg.frame_length,
        frame_step_ms=cfg.frame_step, feat_dim=cfg.feat_dim,
        feat_type=cfg.feat_type, apply_cmvn=cfg.cmvn,
        fft_length=cfg.fft_length, num_mel_filters=cfg.num_mel_filters,
        use_pallas=False)
    if feat.ndim == 3:  # no-cmvn path: single channel, like preprocess
        feat = feat[..., None]
    # mirror the feature pipeline's one-frame minimum (its pad rows carry
    # audiolen=1 FRAME): a sub-frame signal (e.g. an eval pad row) keeps
    # one zeroed frame so downstream masked ops stay finite
    return feat, jnp.maximum(featlen, 1)


def extract_features_list(signals, cfg, batch_size: int = 128,
                          pad_quantum_s: float = 1.0):
    """Variable-length corpus featurization on device.

    Replaces the reference's per-utterance CPU loop (preprocess.py:67-89):
    utterances are sorted by length, grouped into batches, padded to a
    quantized sample count (so only a handful of static shapes compile),
    pushed through the jitted batched frontend, and un-padded back into
    per-utterance (T_i, D, 3) float32 arrays in the original order.
    """
    n = len(signals)
    order = sorted(range(n), key=lambda i: len(signals[i]))
    quantum = max(int(pad_quantum_s * cfg.sample_rate), 1)
    out = [None] * n
    for lo in range(0, n, batch_size):
        idx = order[lo:lo + batch_size]
        group = [np.asarray(signals[i], np.float32) for i in idx]
        lens = np.asarray([len(g) for g in group], np.int32)
        S = round_up(int(lens.max()), quantum)
        padded = np.zeros((len(group), S), np.float32)
        for r, g in enumerate(group):
            padded[r, :len(g)] = g
        feats, featlen = extract_features_cfg(
            jnp.asarray(padded), jnp.asarray(lens), cfg)
        feats = np.asarray(jax.device_get(feats))
        featlen = np.asarray(jax.device_get(featlen))
        for r, i in enumerate(idx):
            out[i] = feats[r, :featlen[r]]
    return out
