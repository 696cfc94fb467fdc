"""Data augmentation: speed and volume perturbation.

The reference shells out to sox per file (`sox in.flac out.flac speed 0.9`,
utils/augmentation.py:6-31), re-rendering the whole corpus to disk.  sox's
`speed` effect IS a sample-rate change (pitch and tempo shift together):
the output reads the signal at `speed` times the original rate, rendered
through sox's bandlimited (windowed-sinc polyphase) resampler.

The TPU-native equivalent here resamples the waveform in memory with the
same signal-processing class as sox: the speed factor is approximated by a
rational up/down ratio and the signal is interpolated through a
Kaiser-windowed sinc low-pass (cutoff at the narrower of the two Nyquist
rates, so upsampling images AND downsampling aliases are suppressed),
then decimated.  A `quality="linear"` mode keeps the cheap
linear-interpolation path (round-1 behavior) for comparison; the alias
suppression of the sinc path vs linear is pinned by test
(tests/test_aux_subsystems.py).

Volume perturbation is the scaler the reference has but keeps commented
out (utils/augmentation.py:33-56, README.md:26).
"""

from __future__ import annotations

import functools as _functools
from fractions import Fraction
from typing import List, Sequence

from ..utils.numerics import cdiv

import numpy as np

# Kaiser design: beta 8.6 gives ~90 dB stopband with enough taps;
# 16 zero crossings per side at the wider rate keeps transition narrow.
_KAISER_BETA = 8.6
_NUM_ZEROS = 16


def _rational_speed(speed: float, max_den: int = 1000) -> Fraction:
    """speed = down/up as a reduced fraction (0.9 -> 9/10: upsample 10,
    decimate 9; output length ~ len/speed).

    max_den 1000 keeps the rate error below 5e-7 relative for arbitrary
    factors and makes common sample-rate ratios exact (e.g. 11025/16000
    = 441/640)."""
    if speed <= 0:
        raise ValueError(f"speed must be positive, got {speed}")
    return Fraction(speed).limit_denominator(max_den)


def design_resample_filter(up: int, down: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass for polyphase up/down resampling.

    Designed at the upsampled rate: cutoff = min(1/up, 1/down) of that
    rate's Nyquist (anti-image for upsampling, anti-alias for
    decimation), gain `up` to preserve amplitude through zero-stuffing.
    Odd length 2H+1, centered (zero-phase after delay compensation).
    """
    c = min(1.0 / up, 1.0 / down)
    H = _NUM_ZEROS * max(up, down)
    n = np.arange(-H, H + 1)
    h = c * np.sinc(c * n) * np.kaiser(2 * H + 1, _KAISER_BETA)
    return (up * h).astype(np.float64)


def _resample_sinc(signal: np.ndarray, up: int, down: int,
                   n_out: int) -> np.ndarray:
    """Bandlimited rational resampling: polyphase FIR interpolation to the
    up-rate (scipy.signal.upfirdn's C kernel; no zero-stuffed array is
    materialized), then strided decimation with the filter's group delay
    compensated exactly."""
    from scipy.signal import upfirdn

    h = design_resample_filter(up, down)
    H = (len(h) - 1) // 2
    x = signal.astype(np.float64)
    # extend the input so every requested output position exists in the
    # interpolated stream (the trailing samples then decay through the
    # sinc tail instead of being zero-filled)
    last_pos = H + (n_out - 1) * down           # upsampled index needed
    have = (len(x) - 1) * up + len(h) - 1       # last index upfirdn yields
    if last_pos > have:
        x = np.pad(x, (0, cdiv(last_pos - have, up)))
    # full interpolated stream f[k] = (zero-stuffed x * h)[k]; value at
    # upsampled position p is f[p + H]
    f = upfirdn(h, x, up=up, down=1)
    return f[H + np.arange(n_out, dtype=np.int64) * down]


def speed_perturb(signal: np.ndarray, speed: float,
                  quality: str = "sinc") -> np.ndarray:
    """Resample so the utterance plays `speed` times faster (sox `speed`
    semantics: pitch and tempo scale together; a tone at f comes out at
    f*speed).  Output length = floor(len / speed).

    quality: 'sinc' (default) = Kaiser-windowed sinc polyphase, the
    sox-fidelity path; 'linear' = 2-tap linear interpolation (cheap,
    aliases high frequencies).
    """
    n_out = int(len(signal) / speed)
    if quality == "sinc":
        frac = _rational_speed(speed)
        down, up = frac.numerator, frac.denominator
        if up == down:
            return signal.astype(signal.dtype, copy=True)
        return _resample_sinc(signal, up, down, n_out).astype(signal.dtype)
    if quality != "linear":
        raise ValueError(f"unknown quality {quality!r}")
    pos = np.arange(n_out) * speed
    i0 = np.minimum(pos.astype(np.int64), len(signal) - 1)
    i1 = np.minimum(i0 + 1, len(signal) - 1)
    frac = pos - i0
    return ((1.0 - frac) * signal[i0] + frac * signal[i1]).astype(signal.dtype)


def volume_perturb(signal: np.ndarray, vol: float) -> np.ndarray:
    """Scale amplitude by `vol` with clipping to [-1, 1] (sox `vol` semantics
    for the reference's commented-out VolumeAugmentation)."""
    return np.clip(signal * vol, -1.0, 1.0).astype(signal.dtype)


SPEED_LIST = (0.9, 1.1)  # reference: preprocess.py:160


def speed_augment_all(signals: Sequence[np.ndarray],
                      speed: float) -> List[np.ndarray]:
    return [speed_perturb(s, speed) for s in signals]


def host_noise(rng: np.random.Generator, n: int, kind: str) -> np.ndarray:
    """Unit-power noise vector: 'white' (flat) or 'pink' (1/f shaped)."""
    if kind not in ("white", "pink"):
        raise ValueError(f"noise kind must be 'white' or 'pink', got {kind!r}")
    x = rng.standard_normal(n).astype(np.float64)
    if kind == "pink":
        spec = np.fft.rfft(x)
        k = np.arange(spec.shape[0], dtype=np.float64)
        spec /= np.sqrt(np.maximum(k, 1.0))
        spec[0] = 0.0
        x = np.fft.irfft(spec, n=n)
    return x / max(np.sqrt(np.mean(x * x)), 1e-12)


def make_degrader(noise_snr: str, noise_kind: str, reverb_p: float,
                  sample_rate: int = 16000):
    """Host-side acoustic degradation for corpus tooling: optional random
    reverberation (exponential-decay noise impulse response, RT60 drawn
    from [0.15, 0.5] s) then additive white/pink noise at a per-utterance
    SNR drawn uniformly from the 'lo,hi' dB range (empty = no noise).
    Returns `degrade(sig, rng) -> sig` or None when fully disabled.

    Used by tools/synth_corpus.py (degrade while synthesizing) and
    tools/degrade_corpus.py (degrade an existing LibriSpeech-layout
    corpus); the on-device training-time counterpart is
    online_noise_perturb.  No reference counterpart (the reference's
    augmentations are speed/volume only, utils/augmentation.py).
    """
    if not noise_snr and reverb_p <= 0:
        return None
    snr_range = None
    if noise_snr:
        parts = [float(v) for v in str(noise_snr).split(",")]
        if len(parts) not in (1, 2):
            raise ValueError(
                f"noise SNR must be 'db' or 'lo,hi', got {noise_snr!r}")
        snr_range = (parts[0], parts[-1])
        if snr_range[0] > snr_range[1]:
            raise ValueError(f"noise SNR low > high: {noise_snr}")
        host_noise(np.random.default_rng(0), 8, noise_kind)  # validate kind

    def degrade(sig: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if reverb_p > 0 and rng.random() < reverb_p:
            rt60 = rng.uniform(0.15, 0.5)
            L = int(0.6 * rt60 * sample_rate)
            t = np.arange(L) / sample_rate
            ir = rng.standard_normal(L) * np.exp(-3.0 * np.log(10) * t / rt60)
            ir[0] = 1.0
            ir /= np.sqrt(np.sum(ir * ir))
            n = len(sig) + L - 1
            sig = np.fft.irfft(np.fft.rfft(sig, n) * np.fft.rfft(ir, n),
                               n)[:len(sig)]
        if snr_range is not None:
            p_sig = float(np.mean(sig * sig))
            if p_sig > 0:
                snr_db = rng.uniform(*snr_range)
                noise = host_noise(rng, len(sig), noise_kind)
                sig = sig + np.sqrt(p_sig / 10.0 ** (snr_db / 10.0)) * noise
        peak = float(np.abs(sig).max())
        if peak > 0.99:
            sig = sig * (0.99 / peak)
        return sig

    return degrade


# ===========================================================================
# On-device online speed perturbation (beyond-reference capability)
# ===========================================================================
#
# The reference re-renders the whole corpus to disk per speed factor
# (utils/augmentation.py:6-31: one sox subprocess per file per rate) and
# trains on the union.  With --audio_shards the waveform is already inside
# the jitted train step, so the same bandlimited resampling can run
# on-device with a fresh random rate per batch: upfirdn(h, x, up, down)
# IS a dilated strided convolution, which is exactly
# lax.conv_general_dilated(lhs_dilation=up, window_strides=down) with the
# (symmetric) Kaiser-sinc kernel — the MXU does the polyphase FIR.  The
# numbers match the host _resample_sinc sample for sample (pinned by
# tests/test_audio_shards.py); the corpus is never re-rendered, and every
# epoch sees a different random speed assignment instead of the
# reference's fixed three copies.

import jax
import jax.numpy as jnp


def _parse_rates(spec: str):
    rates = tuple(float(r) for r in str(spec).split(",") if r.strip())
    if not rates:
        raise ValueError(f"no rates in online_speed_rates={spec!r}")
    if any(r <= 0 for r in rates):
        raise ValueError(f"speeds must be positive: {rates}")
    return rates


@_functools.lru_cache(maxsize=32)
def _rate_fractions(spec: str):
    """Parsed (up, down) pairs for a rate spec — cached: the loader calls
    worst_stretch_len per record per pass, and Fraction construction per
    call would put seconds of pure Python on the producer thread at
    LibriSpeech scale."""
    out = []
    for r in _parse_rates(spec):
        frac = _rational_speed(r)
        out.append((frac.denominator, frac.numerator))  # (up, down)
    return tuple(out)


def worst_stretch_len(n: int, rates_spec: str) -> int:
    """Largest output sample count any configured rate can produce from an
    n-sample signal — the loader buckets training records by THIS length
    so the slowest rate's output still fits the bucket's padded buffer."""
    out = n
    for up, down in _rate_fractions(rates_spec):
        out = max(out, (n * up) // down)
    return out


def resample_rational_device(sig: jnp.ndarray, siglen: jnp.ndarray,
                             up: int, down: int):
    """On-device bandlimited rational resampling of a padded batch.

    sig: (B, S) float32 padded waveforms; siglen: (B,) valid counts.
    Returns (out (B, S), new_len) with out[n] = f[H + n*down] exactly as
    the host _resample_sinc computes it (the trailing zeros of the padded
    buffer play the role of the host's explicit tail padding), truncated
    or zero-padded to the same S-sample buffer, and samples at or beyond
    new_len = floor(siglen*up/down) zeroed.
    """
    if up == down:
        return sig, siglen.astype(jnp.int32)
    h = design_resample_filter(up, down)
    H = (len(h) - 1) // 2
    B, S = sig.shape
    # cross-correlation with pad_lo=H gives out[n] = sum_m xd[m] h_rev[
    # n*down - H + (t)] ... with h symmetric, h reversed == h, and the
    # result is the zero-stuffed convolution sampled at H + n*down
    w = jnp.asarray(h[::-1].copy(), jnp.float32).reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        sig[:, None, :].astype(jnp.float32), w,
        window_strides=(down,), padding=[(H, H + down)],
        lhs_dilation=(up,), dimension_numbers=("NCH", "OIH", "NCH"))[:, 0]
    if out.shape[1] >= S:
        out = out[:, :S]
    else:
        out = jnp.pad(out, ((0, 0), (0, S - out.shape[1])))
    # int32 is ample: S*up tops out ~3e6 for any real utterance/rate
    new_len = jnp.minimum((siglen.astype(jnp.int32) * up) // down,
                          S).astype(jnp.int32)
    mask = jnp.arange(S)[None, :] < new_len[:, None]
    return out * mask.astype(out.dtype), new_len


def online_speed_perturb(rng, sig: jnp.ndarray, siglen: jnp.ndarray, cfg):
    """Pick one configured rate per BATCH (the batch-level-coin precedent
    the reference sets for scheduled sampling) and resample on-device.
    The padded buffer width is preserved; callers must have bucketed by
    worst_stretch_len so slow rates fit."""
    rates = _parse_rates(cfg.online_speed_rates)

    def make_branch(r):
        frac = _rational_speed(r)
        down, up = frac.numerator, frac.denominator

        def branch(s, n):
            return resample_rational_device(s, n, up, down)
        return branch

    branches = [make_branch(r) for r in rates]
    idx = jax.random.randint(rng, (), 0, len(rates))
    return jax.lax.switch(idx, branches, sig, siglen)


def online_volume_perturb(rng, sig: jnp.ndarray, cfg):
    """Per-UTTERANCE random gain in [online_volume_low, online_volume_high]
    with clipping to [-1, 1] — the on-device version of volume_perturb
    (the reference ships this commented out, utils/augmentation.py:33-56).
    Gains are drawn per utterance (amplitude is an utterance property;
    unlike speed it costs nothing to vary within the batch)."""
    lo, hi = cfg.online_volume_low, cfg.online_volume_high
    if not 0 < lo <= hi:
        raise ValueError(f"need 0 < low <= high, got [{lo}, {hi}]")
    gains = jax.random.uniform(rng, (sig.shape[0], 1), jnp.float32, lo, hi)
    return jnp.clip(sig * gains, -1.0, 1.0)


@_functools.lru_cache(maxsize=1)
def _pink_fir(num_taps: int = 513, design_len: int = 4096) -> np.ndarray:
    """Zero-phase FIR approximating a 1/sqrt(f) amplitude (1/f power)
    response, frequency-sampled on a design_len grid, Hamming-windowed to
    num_taps, unit-power-normalized.  DC is zeroed."""
    assert num_taps % 2 == 1
    f = np.fft.rfftfreq(design_len)
    amp = np.zeros_like(f)
    amp[1:] = 1.0 / np.sqrt(np.maximum(f[1:], f[1]))
    ir = np.fft.irfft(amp)                       # zero-phase, wraps around
    ir = np.roll(ir, design_len // 2)            # center the peak
    mid = design_len // 2
    h = ir[mid - num_taps // 2: mid + num_taps // 2 + 1] * np.hamming(num_taps)
    return (h / np.sqrt(np.sum(h * h))).astype(np.float32)


def online_noise_perturb(rng, sig: jnp.ndarray, siglen: jnp.ndarray, cfg):
    """Per-UTTERANCE additive noise at a random SNR, on-device.

    Beyond-reference robustness augmentation (the reference's only
    augmentations are offline sox re-renders, utils/augmentation.py):
    draws snr_db ~ U[online_noise_snr_low, online_noise_snr_high] per
    utterance and adds 'white' (flat) or 'pink' (1/f, via an on-device
    rFFT shaping) noise scaled so that, over the VALID samples,
    P_signal / P_noise = 10^(snr_db/10).  Samples at or beyond siglen
    stay exactly zero (padding must not grow energy: the frontend's
    frame masking and bucket membership depend on siglen alone), and the
    sum is clipped to [-1, 1] like every waveform entering the frontend.
    Silent utterances (zero signal power) receive no noise.

    Each utterance is noised with probability online_noise_p (an
    independent per-utterance coin); utterances that miss the coin pass
    through exactly.  p < 1 trains a mixed-condition model: always-on
    noise (p = 1) makes clean speech out-of-domain, measured in the
    robustness study (benchmarks/WER_SYNTH.md).
    """
    lo, hi = cfg.online_noise_snr_low, cfg.online_noise_snr_high
    if not lo <= hi:
        raise ValueError(f"need snr_low <= snr_high, got [{lo}, {hi}]")
    if cfg.online_noise_kind not in ("white", "pink"):
        raise ValueError(f"online_noise_kind must be 'white' or 'pink', "
                         f"got {cfg.online_noise_kind!r}")
    p = cfg.online_noise_p
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"need 0 <= online_noise_p <= 1, got {p}")
    B, S = sig.shape
    k_noise, k_snr, k_coin = jax.random.split(rng, 3)
    noise = jax.random.normal(k_noise, (B, S), jnp.float32)
    if cfg.online_noise_kind == "pink":
        # shape white noise to ~1/f power with a FIR convolution.  NOT an
        # rFFT: XLA:TPU lowers FFTs of non-power-of-two lengths (a
        # 1710-frame bucket is 274,000 samples = 2^4*5^3*137) to a DENSE
        # DFT matmul — a (S, S) float32 intermediate, ~300 GB.  The
        # 513-tap filter is exact down to ~f_s/500 and is one strided
        # conv on the MXU; per-utterance SNR stays exact regardless
        # because noise power is measured after shaping.
        h = jnp.asarray(_pink_fir())
        K = h.shape[0]
        noise = jax.lax.conv_general_dilated(
            noise[:, None, :], h.reshape(1, 1, -1), window_strides=(1,),
            padding=[(K // 2, K // 2)],
            dimension_numbers=("NCH", "OIH", "NCH"))[:, 0]
    mask = (jnp.arange(S)[None, :] < siglen[:, None]).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)           # (B,)
    p_sig = jnp.sum(sig * sig * mask, axis=-1) / n_valid
    p_noise = jnp.sum(noise * noise * mask, axis=-1) / n_valid
    snr_db = jax.random.uniform(k_snr, (B,), jnp.float32, lo, hi)
    p_target = p_sig / 10.0 ** (snr_db / 10.0)
    gain = jnp.sqrt(p_target / jnp.maximum(p_noise, 1e-20))
    gain = jnp.where(p_sig > 0.0, gain, 0.0)
    if p < 1.0:  # static: the coin (and its RNG draw) compiles out at p=1
        coin = jax.random.bernoulli(k_coin, p, (B,))
        gain = jnp.where(coin, gain, 0.0)
    out = jnp.clip(sig + gain[:, None] * noise, -1.0, 1.0)
    return out * mask


# ===========================================================================
# SpecAugment (on-device, beyond-reference capability)
# ===========================================================================
#
# The reference's only augmentations are offline sox re-renders of the
# corpus (utils/augmentation.py).  SpecAugment (Park et al., 2019) is the
# standard feature-domain augmentation for LAS-family models; here it is
# TPU-native: pure-JAX masking applied INSIDE the jitted train step
# (models/las.py:total_loss), so it costs one fused elementwise multiply
# — no host work, no extra HBM traffic, nothing re-rendered to disk.
# Masked bins are zeroed; after per-utterance CMVN zero is the feature
# mean, which is the conventional fill value.


def _axis_mask(key, n_masks: int, axis_len: int, max_width, limit):
    """Boolean (axis_len,) mask: union of `n_masks` random spans.

    Span widths ~ U[0, max_width]; starts ~ U[0, limit - width] so spans
    stay inside the valid region [0, limit) (limit = utterance length for
    the time axis, full dim for frequency).  All shapes static.
    """
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (n_masks,), 0,
                                jnp.asarray(max_width) + 1)
    widths = jnp.minimum(widths, limit)
    span = jnp.maximum(limit - widths, 1)
    starts = jnp.floor(
        jax.random.uniform(ks, (n_masks,)) * span).astype(jnp.int32)
    pos = jnp.arange(axis_len)[None, :]
    hit = (pos >= starts[:, None]) & (pos < (starts + widths)[:, None])
    return jnp.any(hit, axis=0)


def spec_augment(rng, audio, audiolen, cfg):
    """Random time and frequency masking on a feature batch.

    audio: (B, T, D, C) float features (CMVN'd, deltas stacked);
    audiolen: (B,) valid frame counts.  Per utterance:
    `sa_freq_masks` spans of width U[0, sa_freq_width] zero whole feature
    rows (all C delta channels), and `sa_time_masks` spans of width
    U[0, min(sa_time_width, sa_time_ratio * audiolen)] zero whole frames.
    """
    B, T, D, _ = audio.shape

    def one(key, length):
        kt, kf = jax.random.split(key)
        t_cap = jnp.minimum(
            cfg.sa_time_width,
            (cfg.sa_time_ratio * length.astype(jnp.float32))
            .astype(jnp.int32))
        tmask = _axis_mask(kt, cfg.sa_time_masks, T, t_cap, length)
        fmask = _axis_mask(kf, cfg.sa_freq_masks, D, cfg.sa_freq_width, D)
        return tmask, fmask

    keys = jax.random.split(rng, B)
    tmask, fmask = jax.vmap(one)(keys, audiolen.astype(jnp.int32))
    keep = ~(tmask[:, :, None] | fmask[:, None, :])          # (B, T, D)
    return audio * keep[..., None].astype(audio.dtype)
