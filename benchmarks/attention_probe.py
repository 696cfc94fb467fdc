"""Attention-step cost decomposition: is there room for a fused Pallas
attention kernel?  (VERDICT round-2 ask #6; run manually on TPU.)

decoder_profile.py attributes ~22-28 us/step to the location-attention
path at published size.  A fused Pallas energy+softmax+context kernel
can only win back (a) intermediates XLA materializes to HBM between ops
and (b) scheduling overhead — it CANNOT beat the two structural matmuls
(the Toeplitz f einsum and the context reduction) whose shapes are fixed
by the math (C=10 contraction pads to the 128-wide MXU either way, and
Mosaic cannot reshape the (B, St*C) f layout across lanes to feed the
W_f contraction without the same relayout XLA performs).

This probe measures the ISOLATED attention step (align -> attend ->
align carry, K-amplified, min of paired reps) and subtracts ablations:

  full      h_proj + w_s s + w_f(Toeplitz f) -> tanh -> u -> softmax -> ctx
  no_wf     f folded as a raw A-slice (removes the (B*S,10)@(10,A) proj)
  add       additive attention (removes f einsum + proj entirely)
  bare      the two unavoidable matmuls only (f einsum + context), no
            elementwise chain / softmax at all

(full - bare) bounds EVERYTHING a fused kernel could save: elementwise
chains, the (B,S,A) tanh intermediate, softmax, and scheduling.  If that
gap is small relative to `bare`, the fused kernel is dead by roofline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.ops import attention, layers


def timed(fn, n=3):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def measure(body, args, K=32, reps=3):
    """Device time per body evaluation: K-amplified inside one program,
    min of paired (t1, tK) reps (the tunneled chip is time-shared)."""
    def make(k):
        @jax.jit
        def f(*a):
            def it(i, align):
                return body(*a[:-1], align)
            return jnp.sum(jax.lax.fori_loop(0, k, it, a[-1]))
        return lambda: f(*args)
    f1, fK = make(1), make(K)
    float(jax.device_get(f1())); float(jax.device_get(fK()))
    dts = []
    for _ in range(reps):
        t1, tK = timed(f1), timed(fK)
        dts.append((tK - t1) / (K - 1))
    return min(dts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--enc_T", type=int, default=512)
    ap.add_argument("--att", type=int, default=128)
    ap.add_argument("--hdim", type=int, default=512)
    ap.add_argument("--sdim", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    B, S, A, H = args.batch, args.enc_T, args.att, args.hdim
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = jax.random.PRNGKey(0)
    kp, kh, ks = jax.random.split(rng, 3)
    p = attention.location_init(kp, H, args.sdim, A)
    p = jax.tree_util.tree_map(lambda x: x.astype(dt), p)
    hidden = (jax.random.normal(kh, (B, S, H)) * 0.1).astype(dt)
    state = (jax.random.normal(ks, (B, args.sdim)) * 0.1).astype(dt)
    seqlen = jnp.full((B,), S, jnp.int32)
    align0 = jax.nn.softmax(jnp.zeros((B, S), jnp.float32), axis=-1)

    h_proj = attention.precompute_hidden(p, hidden)
    s_proj = layers.dense_apply(p["w_s"], state)
    loc_proj = attention.precompute_location(p, S).astype(dt)

    def full(hidden, h_proj, s_proj, loc_proj, align):
        f = jnp.einsum("bt,tsc->bsc", align.astype(dt), loc_proj)
        f = f + p["conv_b"]
        v = jnp.tanh(h_proj + s_proj[:, None, :]
                     + layers.dense_apply(p["w_f"], f))
        energy = jnp.einsum("bta,a->bt", v, p["u"])
        _, alphas = attention.masked_attend(hidden, energy, seqlen)
        return alphas

    def no_wf(hidden, h_proj, s_proj, loc_proj, align):
        f = jnp.einsum("bt,tsc->bsc", align.astype(dt), loc_proj)
        v = jnp.tanh(h_proj + s_proj[:, None, :]
                     + jnp.pad(f, ((0, 0), (0, 0), (0, A - f.shape[-1]))))
        energy = jnp.einsum("bta,a->bt", v, p["u"])
        _, alphas = attention.masked_attend(hidden, energy, seqlen)
        return alphas

    def add(hidden, h_proj, s_proj, loc_proj, align):
        v = jnp.tanh(h_proj + s_proj[:, None, :])
        energy = jnp.einsum("bta,a->bt", v, p["u"]) + 1e-9 * align[:, 0:1]
        _, alphas = attention.masked_attend(hidden, energy, seqlen)
        return alphas

    def bare(hidden, h_proj, s_proj, loc_proj, align):
        f = jnp.einsum("bt,tsc->bsc", align.astype(dt), loc_proj)
        energy = jnp.sum(f, axis=-1).astype(jnp.float32)  # no tanh chain
        # keep the carry bounded across K iterations (one cheap VPU pass;
        # without it the loop blows up to inf and timing goes unphysical)
        energy = energy / (jnp.max(jnp.abs(energy)) + 1.0)
        ctx = jnp.einsum("bt,bth->bh", energy, hidden)
        return energy + 1e-9 * jnp.sum(ctx)[None, None]

    common = (hidden, h_proj, s_proj, loc_proj, align0)
    print(f"isolated attention step: B={B} S={S} A={A} H={H} "
          f"dtype={args.dtype} (K-amplified, min of paired reps)")
    results = {}
    for name, body in (("full", full), ("no_wf", no_wf), ("add", add),
                       ("bare", bare)):
        t = measure(body, common)
        results[name] = t
        print(f"  {name:6s} {t*1e6:7.1f} us/step", flush=True)
    print(f"  derived: w_f proj {1e6*(results['full']-results['no_wf']):.1f}"
          f" us; f einsum+chain {1e6*(results['no_wf']-results['add']):.1f}"
          f" us; fusion headroom (full - bare) "
          f"{1e6*(results['full']-results['bare']):.1f} us")


if __name__ == "__main__":
    main()
