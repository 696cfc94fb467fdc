"""Decoder-step cost decomposition (run manually on TPU).

The roofline (benchmarks/RESULTS.md) says the greedy-eval program is
~640 us per decoder step at the published shape while the raw math is
~100 us; this bench decomposes the gap so any hand-written kernel work
targets the real cost instead of a guess.  Ablations:

  encoder     listener_apply alone (everything outside the decoder scan)
  full        las_forward inference (encoder + scan)
  spell/loc   speller_apply alone on a held fixed enc_out (loc attention)
  spell/add   same with additive attention (ablates the 201-tap conv)
  spell/noctx speller with enc_out length 8 (ablates context/energy size)
  unroll=k    spell/loc at scan_unroll k (weight-stream amortization)

Timings force completion via float(jax.device_get(.)) per CLAUDE.md.

Usage: python benchmarks/decoder_profile.py [--quick] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las


def timed(fn, n=5):
    """Median single-dispatch latency (includes the platform's host->
    device dispatch floor — ~28 ms through the axon tunnel)."""
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def timed_pipelined(fn, n=10):
    """Per-dispatch time with n dispatches in flight (inputs device-
    resident, results fetched at the end): amortizes the dispatch floor
    the way the eval/serving drivers do via prefetch, so this is the
    THROUGHPUT-side number."""
    float(jax.device_get(fn()))  # warm
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    for o in outs:
        float(jax.device_get(o))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="256-unit robust-study size instead of published")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--enc_T", type=int, default=512)
    ap.add_argument("--dec_steps", type=int, default=64)
    args = ap.parse_args()

    B, T, S = args.batch, args.enc_T, args.dec_steps
    size = dict(enc_units=512, num_enc_layers=4, dec_units=1024,
                num_dec_layers=2, embedding_size=256, attention_size=128,
                num_enc_channels=32)
    if args.quick:
        size.update(enc_units=256, num_enc_layers=3, dec_units=256,
                    embedding_size=128)
    base = Config(unit="char", vocab_size=30, mode="loc", enc_type="cnn",
                  feat_dim=13, dtype=args.dtype, dropout_rate=0.0,
                  scheduled_sampling=False, **size)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 4 * T, base.feat_dim, 3)),
                        jnp.float32)
    audiolen = jnp.full((B,), 4 * T, jnp.int32)

    def spell_only(cfg, T_enc):
        """speller_apply on a held random enc_out of the listener's shape.
        enc_out/params are jit ARGUMENTS (device-resident), not closure
        constants — embedded constants distort dispatch cost."""
        H = las.enc_out_dim(cfg)
        params = las.speller_init(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(rng.standard_normal((B, T_enc, H)), jnp.float32)
        params, enc = las.compute_cast(cfg, {"speller": params}, enc)
        params = jax.device_put(params["speller"])
        enc = jax.device_put(enc)
        enc_len = jnp.full((B,), T_enc, jnp.int32)

        @jax.jit
        def f(params, enc):
            logits, alphas = las.speller_apply(
                params, cfg, enc, enc_len, S, None, is_training=False)
            return jnp.sum(logits.astype(jnp.float32))
        g = lambda: f(params, enc)
        float(jax.device_get(g()))  # compile
        return timed(g), timed_pipelined(g)

    def full(cfg):
        params, state = jax.device_put(
            las.las_init(jax.random.PRNGKey(0), cfg))

        @jax.jit
        def f(params, state, audio):
            logits, _, _, _, _ = las.las_forward(
                params, state, audio, audiolen, cfg, S,
                is_training=False)
            return jnp.sum(logits)

        @jax.jit
        def enc_fn(params, state, audio):
            p, a = las.compute_cast(cfg, params, audio)
            enc_out, enc_len, _ = las.listener_apply(
                p["listener"], state["listener"], a, audiolen, cfg,
                False, None)
            return jnp.sum(enc_out.astype(jnp.float32))
        g = lambda: f(params, state, audio)
        enc_only = lambda: enc_fn(params, state, audio)
        float(jax.device_get(g()))
        float(jax.device_get(enc_only()))
        return (timed(g), timed_pipelined(g),
                timed(enc_only), timed_pipelined(enc_only))

    rows = []
    t_full, tp_full, t_enc, tp_enc = full(base)
    rows.append(("encoder only", t_enc, tp_enc))
    rows.append(("full eval fwd", t_full, tp_full))
    rows.append(("derived scan", t_full - t_enc, tp_full - tp_enc))
    for label, cfg, t_enc_len in (
            ("spell/loc", base, T),
            ("spell/add", base.replace(mode="add"), T),
            ("spell/noctx(T=8)", base, 8),
            ("spell/loc unroll4", base.replace(scan_unroll=4), T),
            ("spell/loc unroll8", base.replace(scan_unroll=8), T)):
        lat, thr = spell_only(cfg, t_enc_len)
        rows.append((label, lat, thr))
    print(f"\nshape: B={B} T_enc={T} S={S} dtype={args.dtype} "
          f"{'quick' if args.quick else 'published'} size")
    print(f"  {'':20s} {'latency':>10s} {'pipelined':>10s} "
          f"{'us/step(pl)':>12s}")
    for label, lat, thr in rows:
        print(f"  {label:20s} {lat*1e3:8.2f} ms {thr*1e3:8.2f} ms "
              f"{thr/S*1e6:10.1f}")


if __name__ == "__main__":
    main()
