"""Serving-path benchmark: dynamic-batching throughput and latency.

Measures the BatchingRecognizer (serving.py) end to end — host FLAC-less
path: waveform -> on-device frontend -> greedy or beam decode -> text —
under (a) saturation (offered load >> capacity) and (b) a low-rate
trickle (latency floor).  Run manually on TPU:

    python benchmarks/serve_bench.py [--beam 0|16] [--requests 256]

The model is the published-recipe shape (run.sh:2-27) with random params:
serving perf is independent of the weights' values.
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()
import jax

from automatic_speech_recognition_tpu.api import Recognizer
from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.serving import BatchingRecognizer
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

SR = 16000


def build(beam: int, max_batch: int) -> BatchingRecognizer:
    cfg = Config(unit="char", vocab_size=30, feat_dim=13, enc_type="cnn",
                 enc_units=512, num_enc_channels=32, num_enc_layers=4,
                 dec_units=1024, num_dec_layers=2, embedding_size=256,
                 attention_size=128, mode="loc", dropout_rate=0.0,
                 scheduled_sampling=False, apply_bn=False,
                 beam_size=beam, max_audio_seconds=16.0)
    params, bn_state = las.las_init(jax.random.PRNGKey(0), cfg)
    rec = Recognizer(params, bn_state, cfg, CharEncoder())
    return BatchingRecognizer(rec, max_batch=max_batch, max_wait_ms=10,
                              beam_size=beam, bucket_seconds=(2, 4, 8, 16))


def mixed_signals(n: int, rng) -> list:
    # LibriSpeech-like length mix: mostly 2-8 s, tail to 15 s
    secs = np.clip(rng.gamma(4.0, 1.6, size=n), 1.0, 15.0)
    return [rng.standard_normal(int(s * SR)).astype(np.float32) * 0.1
            for s in secs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--max_batch", type=int, default=16)
    args = ap.parse_args()
    print("devices:", jax.devices())

    srv = build(args.beam, args.max_batch).start()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    srv.warmup()
    print(f"warmup ({len(srv.bucket_seconds)} buckets x batch "
          f"{args.max_batch}): {time.perf_counter()-t0:.1f}s")

    # (a) saturation: all requests offered at once
    sigs = mixed_signals(args.requests, rng)
    audio_secs = sum(len(s) for s in sigs) / SR
    t0 = time.perf_counter()
    futs = [srv.submit(s) for s in sigs]
    texts = [f.result(timeout=600) for f in futs]
    dt = time.perf_counter() - t0
    assert all(isinstance(t, str) for t in texts)
    snap = srv.stats.snapshot()
    print(f"saturation: {args.requests} utts ({audio_secs:.0f} s audio) in "
          f"{dt:.2f} s -> {args.requests/dt:.1f} utt/s, "
          f"RTF {dt/audio_secs:.5f} ({audio_secs/dt:.0f}x realtime), "
          f"mean batch occupancy {snap['mean_batch_occupancy']:.1f}")

    # (b) trickle: one request at a time -> pure latency
    lat = []
    for s in mixed_signals(16, rng):
        t0 = time.perf_counter()
        srv.transcribe(s, timeout=600)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(f"trickle latency: p50 {lat[len(lat)//2]*1e3:.0f} ms, "
          f"max {lat[-1]*1e3:.0f} ms (incl. {srv.max_wait_s*1e3:.0f} ms "
          f"batching window)")
    srv.stop()


if __name__ == "__main__":
    main()
