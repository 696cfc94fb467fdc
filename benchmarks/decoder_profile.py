"""Decoder-step cost decomposition with DEVICE-time resolution
(run manually on TPU).

Wall-clock timing of one dispatch cannot resolve sub-25 ms programs on
the tunneled platform: a single host->device dispatch costs ~25-30 ms
RPC no matter how small the program, and dispatches do NOT overlap, so
both naive and "pipelined" timings saturate at the floor (measured
2026-08-18; benchmarks/RESULTS.md "Dispatch floor").  This bench
resolves true device time the same way bench.py does: run the body K
times INSIDE one jitted program with a serializing scalar carry and
report (t_K - t_1) / (K - 1).

Ablations: encoder alone; full greedy eval forward; loc vs additive
attention (isolates the 201-tap location conv); scan_unroll on both.

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


def timed(fn, n=3):
    float(jax.device_get(fn()))  # compile + warm
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def measure_body(body, params_state, audio, K=8):
    """Device time per body evaluation via K-amplification: the scalar
    carry makes iterations data-dependent (no CSE, no overlap), and the
    dispatch floor cancels in the difference."""
    def run(k):
        @jax.jit
        def f(params, state, audio):
            def it(i, acc):
                return acc + body(params, state, audio + acc * 1e-30)
            return jax.lax.fori_loop(0, k, it, 0.0)
        p, s = params_state
        return timed(lambda: f(p, s, audio))
    t1, tK = run(1), run(K)
    return (tK - t1) / (K - 1)


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
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((B, 4 * T, base.feat_dim, 3)), jnp.float32))
    audiolen = jnp.full((B,), 4 * T, jnp.int32)

    def enc_body(cfg):
        def body(params, state, audio):
            p, a = las.compute_cast(cfg, params, audio)
            enc_out, _, _ = las.listener_apply(
                p["listener"], state["listener"], a, audiolen, cfg,
                False, None)
            return jnp.sum(enc_out.astype(jnp.float32))
        return body

    def full_body(cfg):
        def body(params, state, audio):
            logits, _, _, _, _ = las.las_forward(
                params, state, audio, audiolen, cfg, S,
                is_training=False)
            return jnp.sum(logits)
        return body

    from automatic_speech_recognition_tpu.ops import quant

    def q8(params):  # int8 speller weight stream (ops/quant.py)
        return quant.quantize_model_params(params, base.vocab_size)

    cases = (
        ("encoder u1", base, enc_body, None),
        ("encoder u4", base.replace(scan_unroll=4), enc_body, None),
        ("full/loc u1", base, full_body, None),
        ("full/loc u4", base.replace(scan_unroll=4), full_body, None),
        ("full/loc u4 q8", base.replace(scan_unroll=4), full_body, q8),
        ("full/add u1", base.replace(mode="add"), full_body, None),
    )
    print(f"shape: B={B} T_enc={T} S={S} dtype={args.dtype} "
          f"{'quick' if args.quick else 'published'} size "
          f"(device time via K-amplification)")
    results = {}
    for label, cfg, mk, ptrans in cases:
        params, state = las.las_init(jax.random.PRNGKey(0), cfg)
        if ptrans is not None:
            params = ptrans(params)
        ps = jax.device_put((params, state))
        t = measure_body(mk(cfg), ps, audio)
        results[label] = t
        print(f"  {label:14s} {t*1e3:7.2f} ms", flush=True)
    scan = results["full/loc u1"] - results["encoder u1"]
    conv = results["full/loc u1"] - results["full/add u1"]
    print(f"  derived: decoder scan {scan*1e3:.2f} ms "
          f"({scan/S*1e6:.1f} us/step); location conv+proj "
          f"{conv*1e3:.2f} ms ({conv/S*1e6:.1f} us/step)")
    print(f"  eval throughput (device): "
          f"{B/results['full/loc u1']:.0f} utt/s per chip")


if __name__ == "__main__":
    main()
