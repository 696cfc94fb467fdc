"""Beam-search decode benchmark: real-time factor (RTF) on TPU.

RTF = wall-clock seconds per second of audio decoded (lower is better;
BASELINE.md lists beam=16 decode RTF as a tracked metric).  The reference
decodes one utterance at a time with 2-3 sess.runs per token; here a whole
batch decodes in one device call, so RTF is reported per-batch.

Usage: python benchmarks/decode_bench.py [--beam 16] [--batch 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--apply_lm", action="store_true")
    ap.add_argument("--full_size", action="store_true",
                    help="published-recipe model dims")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 weight-only speller/LM stream (ops/quant.py)")
    args = ap.parse_args()

    size = dict(enc_units=256, num_enc_channels=32, num_enc_layers=2,
                dec_units=512, num_dec_layers=2, embedding_size=128)
    if args.full_size:
        size.update(enc_units=512, num_enc_layers=4, dec_units=1024,
                    embedding_size=256)
    cfg = Config(unit="char", vocab_size=30, feat_dim=13, enc_type="cnn",
                 attention_size=128, mode="loc", dropout_rate=0.0,
                 scheduled_sampling=False, convert_rate=0.12, **size)

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

    if args.quantize:
        from automatic_speech_recognition_tpu.ops import quant
        params = quant.quantize_model_params(params, cfg.vocab_size)
        if lm_params is not None:
            lm_params = quant.quantize_lm(lm_params, lm_cfg)

    def run():
        res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                                   max_steps=max_steps, beam_size=args.beam,
                                   lm_params=lm_params, lm_cfg=lm_cfg)
        return jnp.sum(res.scores)

    t0 = time.perf_counter()
    float(jax.device_get(run()))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(jax.device_get(run()))
    dt = (time.perf_counter() - t0) / n
    audio_s = args.batch * args.seconds
    print(f"beam={args.beam} lm={bool(args.apply_lm)} batch={args.batch} "
          f"{args.seconds:.0f}s utts: {dt*1e3:.1f} ms/batch, "
          f"RTF={dt/audio_s:.5f} ({audio_s/dt:.1f}x realtime)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
