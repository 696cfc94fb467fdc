"""Attention-step cost decomposition: is there room for a fused Pallas
attention kernel?  (VERDICT round-2 ask #6; run manually on TPU.)

decoder_profile.py attributes ~2.7 ms of the 64-step greedy forward to
the decoder scan at published size.  A fused Pallas energy+softmax+
context kernel can only win back (a) intermediates XLA materializes
between ops — chiefly the (B, S, A) tanh input/output pair — and
(b) scheduling overhead; it CANNOT beat the structural matmuls (the
Toeplitz f einsum, the w_f projection, the context reduction) whose
FLOPs are fixed by the math.

Methodology note (this file's first version got this wrong): every
variant must consume the loop carry in ALL its expensive terms, or
XLA's loop-invariant hoisting silently moves the work out of the
fori_loop and the subtraction compares different programs.  The real
decoder scan threads the cell state through every step, so the probe
carries a (align, state) pair and closes the loop the same way the
model does: state' = decay·state + ctx @ W_u  (one MXU matmul standing
in for the cell; identical in every variant, so it subtracts out).

Variants (all share softmax, context reduction, state update, carry):

  full   the location step: f = einsum(align, loc_proj);
         v = tanh(h_proj + w_s·state + w_f·f);  e = v·u
  add    additive attention: v = tanh(h_proj + w_s·state);  e = v·u
         (no location einsum / w_f — what dropping location buys)
  noe    "no elementwise chain": e = Σ_c f + h_proj·u + (state·w_s·u)
         — keeps the f einsum + softmax + ctx + state update, removes
         the (B,S,A) tanh chain AND the w_f projection entirely.

(full − noe) therefore upper-bounds EVERYTHING a fused energy kernel
could save (it even includes the w_f FLOPs a fused kernel must still
spend).  If that gap is small against `full`, the kernel is dead by
roofline.  Isolated-step caveats from the int8 study apply: in the
full program XLA overlaps this with cell compute, so end-to-end wins
will be at most what this bounds.
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
from automatic_speech_recognition_tpu.utils.kamp import reduce_dts


def timed(fn, n=3):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def measure(body, args, carry0, K=4096, reps=3):
    """Device time per body evaluation: K-amplified inside one program,
    min of paired (t1, tK) reps (the tunneled chip is time-shared).
    The ~10-60 us body needs K*body >> the ~ms tunnel dispatch noise."""
    def make(k):
        @jax.jit
        def f(*a):
            def it(i, carry):
                return body(*a, carry)
            align, state = jax.lax.fori_loop(0, k, it, carry0)
            return jnp.sum(align.astype(jnp.float32)) + \
                jnp.sum(state.astype(jnp.float32))
        return lambda: f(*args)
    f1, fK = make(1), make(K)
    float(jax.device_get(f1())); float(jax.device_get(fK()))
    dts = []
    for _ in range(reps):
        t1, tK = timed(f1), timed(fK)
        dts.append((tK - t1) / (K - 1))
    return reduce_dts(dts, what="attention_probe")[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--enc_T", type=int, default=512)
    ap.add_argument("--att", type=int, default=128)
    ap.add_argument("--hdim", type=int, default=512)
    ap.add_argument("--sdim", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--K", type=int, default=4096)
    args = ap.parse_args()
    B, S, A, H = args.batch, args.enc_T, args.att, args.hdim
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = jax.random.PRNGKey(0)
    kp, kh, ks, ku = jax.random.split(rng, 4)
    p = attention.location_init(kp, H, args.sdim, A)
    p = jax.tree_util.tree_map(lambda x: x.astype(dt), p)
    hidden = (jax.random.normal(kh, (B, S, H)) * 0.1).astype(dt)
    # the cell stand-in: ctx (B,H) -> state (B,sdim), decay keeps it bounded
    w_u = (jax.random.normal(ku, (H, args.sdim)) * 0.02).astype(dt)
    seqlen = jnp.full((B,), S, jnp.int32)

    h_proj = attention.precompute_hidden(p, hidden)          # (B,S,A)
    loc_proj = attention.precompute_location(p, S).astype(dt)  # (S,S,C)
    # linear-energy precomputes for the `noe` variant (loop-invariant and
    # cheap (B,S)/(A,) tensors; hoisting them is fine — they model terms a
    # fused kernel also would not recompute)
    hu = jnp.einsum("bsa,a->bs", h_proj, p["u"])             # (B,S)
    wsu = layers.dense_apply(p["w_s"], jnp.eye(args.sdim, dtype=dt)) @ p["u"]

    state0 = (jax.random.normal(ks, (B, args.sdim)) * 0.1).astype(dt)
    align0 = jax.nn.softmax(jnp.zeros((B, S), jnp.float32),
                            axis=-1).astype(dt)
    carry0 = (align0, state0)

    def tail(energy, state):
        ctx, alphas = attention.masked_attend(hidden, energy, seqlen)
        return alphas, (state * 0.999 + ctx @ w_u).astype(dt)

    def full(carry):
        align, state = carry
        f = jnp.einsum("bt,tsc->bsc", align, loc_proj) + p["conv_b"]
        v = jnp.tanh(h_proj + layers.dense_apply(p["w_s"], state)[:, None, :]
                     + layers.dense_apply(p["w_f"], f))
        return tail(jnp.einsum("bta,a->bt", v, p["u"]), state)

    def add(carry):
        align, state = carry
        v = jnp.tanh(h_proj + layers.dense_apply(p["w_s"], state)[:, None, :])
        energy = jnp.einsum("bta,a->bt", v, p["u"]) + 0.0 * align
        return tail(energy, state)

    def noe(carry):
        align, state = carry
        f = jnp.einsum("bt,tsc->bsc", align, loc_proj)
        energy = jnp.sum(f, axis=-1) + hu + (state @ wsu)[:, None]
        return tail(energy.astype(dt), state)

    print(f"isolated attention step w/ carried state: B={B} S={S} A={A} "
          f"H={H} sdim={args.sdim} dtype={args.dtype} "
          f"(K={args.K}-amplified, min of paired reps)")
    results = {}
    for name, body in (("full", full), ("add", add), ("noe", noe)):
        t = measure(body, (), carry0, K=args.K)
        results[name] = t
        print(f"  {name:5s} {t*1e6:7.1f} us/step", flush=True)
    print(f"  derived: location terms (full - add) "
          f"{1e6*(results['full']-results['add']):.1f} us; fused-kernel "
          f"ceiling incl. w_f FLOPs (full - noe) "
          f"{1e6*(results['full']-results['noe']):.1f} us")


if __name__ == "__main__":
    main()
