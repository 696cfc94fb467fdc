"""Beam-search decode benchmark: real-time factor (RTF) on TPU.

RTF = device seconds per second of audio decoded (lower is better;
BASELINE.md lists beam=16 decode RTF as a tracked metric).  The reference
decodes one utterance at a time with 2-3 sess.runs per token
(reference las/beam_search.py:61-158); here a whole batch decodes in one
device call, so RTF is reported per-batch.

Timing is K-amplified DEVICE time — the beam search runs K times inside
one jitted program, serialized by a scalar carry, and per-batch time is
(t_K - t_1)/(K - 1).  Per-dispatch wall timing on the tunneled platform
swings +-20% between invocations (the int8 study showed 43.6->38.4 ms
"improvements" that were pure RPC noise; benchmarks/RESULTS.md); the
dispatch floor cancels exactly in the K difference.  On co-located TPU
hosts the floor does not exist, so device time IS the production number.

Usage: python benchmarks/decode_bench.py [--beam 16] [--batch 8]
       [--quantize_decoder {none,int8}] [--apply_lm] [--full_size]
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
from automatic_speech_recognition_tpu.decoding import beam as beam_lib
from automatic_speech_recognition_tpu.models import char_rnn, las
from automatic_speech_recognition_tpu.ops import quant
from automatic_speech_recognition_tpu.utils.kamp import reduce_dts


def timed(fn, n=3):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--apply_lm", action="store_true")
    ap.add_argument("--full_size", action="store_true",
                    help="published-recipe model dims")
    ap.add_argument("--quantize_decoder", default="none",
                    choices=("none", "int8"),
                    help="int8 weight-only speller/LM stream (ops/quant.py;"
                         " same knob as test.py/decode.py/api)")
    ap.add_argument("--k_amp", type=int, default=4,
                    help="inner repetitions for device-time amplification")
    args = ap.parse_args()

    size = dict(enc_units=256, num_enc_channels=32, num_enc_layers=2,
                dec_units=512, num_dec_layers=2, embedding_size=128)
    if args.full_size:
        size.update(enc_units=512, num_enc_layers=4, dec_units=1024,
                    embedding_size=256)
    cfg = Config(unit="char", vocab_size=30, feat_dim=13, enc_type="cnn",
                 attention_size=128, mode="loc", dropout_rate=0.0,
                 scheduled_sampling=False, convert_rate=0.12,
                 quantize_decoder=args.quantize_decoder, **size)

    frames = int(args.seconds * 100)  # 10ms hop
    rng = np.random.default_rng(0)
    params, bn_state = las.las_init(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray(rng.standard_normal(
        (args.batch, frames, cfg.feat_dim, 3)), jnp.float32)
    audiolen = jnp.full((args.batch,), frames, jnp.int32)
    max_steps = max(int(cfg.convert_rate * frames), 1)

    lm_params = lm_cfg = None
    if args.apply_lm:
        lm_cfg = char_rnn.LMConfig(vocab_size=28, hidden_size=512,
                                   embedding_size=0, num_layers=2)
        lm_params = char_rnn.lm_init(jax.random.PRNGKey(1), lm_cfg)

    params = quant.maybe_quantize_params(params, cfg)
    if lm_params is not None and args.quantize_decoder == "int8":
        lm_params = quant.quantize_lm(lm_params, lm_cfg)

    def make(k):
        @jax.jit
        def f(params, audio):
            def it(i, acc):
                res = beam_lib.beam_search(
                    params, bn_state, audio + acc * 1e-30, audiolen, cfg,
                    max_steps=max_steps, beam_size=args.beam,
                    lm_params=lm_params, lm_cfg=lm_cfg)
                return acc + jnp.sum(res.scores)
            return jax.lax.fori_loop(0, k, it, 0.0)
        return lambda: f(params, audio)

    f1, fK = make(1), make(args.k_amp)
    t0 = time.perf_counter()
    float(jax.device_get(f1()))
    print(f"compile+first (k=1): {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(jax.device_get(fK()))
    print(f"compile+first (k={args.k_amp}): {time.perf_counter() - t0:.1f}s",
          flush=True)

    dts = []
    for _ in range(3):
        t1, tK = timed(f1), timed(fK)
        dts.append((tK - t1) / (args.k_amp - 1))
    dt, spread = reduce_dts(dts, reducer="median", what="decode_bench")
    audio_s = args.batch * args.seconds
    print(f"beam={args.beam} lm={bool(args.apply_lm)} batch={args.batch} "
          f"q={args.quantize_decoder} {args.seconds:.0f}s utts: "
          f"{dt*1e3:.2f} ms/batch (device, K-amplified, spread "
          f"{spread:.1f}%), RTF={dt/audio_s:.6f} "
          f"({audio_s/dt:.0f}x realtime)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
