"""Training-step and scan-overhead benchmarks (run manually on TPU).

All timings force completion via jax.device_get of a value that depends on
the full computation — on the tunneled TPU platform, block_until_ready
can return before execution finishes, so naive timings are meaningless.

Usage: python benchmarks/train_bench.py [--quick]
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
from automatic_speech_recognition_tpu.training import trainer


def timed(fn, n=5):
    """Median of n timed calls; fn must return a scalar-able device value."""
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def scan_overhead():
    B, D, U = 96, 781, 256
    w = jnp.asarray(np.random.randn(D + U, U).astype(np.float32) * 0.01)

    def make(T):
        @jax.jit
        def f(xs, w):
            def step(h, x):
                h = jnp.tanh(jnp.concatenate([x, h], -1) @ w)
                return h, h
            _, ys = jax.lax.scan(step, jnp.zeros((xs.shape[1], U)), xs)
            return jnp.sum(ys)
        return f

    results = {}
    for T in (32, 256):
        xs = jnp.asarray(np.random.randn(T, B, D).astype(np.float32))
        f = make(T)
        float(jax.device_get(f(xs, w)))  # compile
        results[T] = timed(lambda: f(xs, w))
    per_iter = (results[256] - results[32]) / (256 - 32)
    print(f"scan: T=32 {results[32]*1e3:.1f} ms, T=256 {results[256]*1e3:.1f} ms"
          f" -> {per_iter*1e6:.1f} us/iter marginal")


def train_bench(quick: bool, unroll: int = 1, from_audio: bool = False):
    B, T, L = 48, 512, 60
    size = dict(enc_units=256, num_enc_channels=32, num_enc_layers=2,
                dec_units=512, num_dec_layers=2, embedding_size=128)
    if not quick:
        size.update(enc_units=512, num_enc_layers=4, dec_units=1024,
                    embedding_size=256)
    rng = np.random.default_rng(0)
    if from_audio:
        # --audio_shards production shape: raw waveforms, the frontend
        # fused into the dispatch (ops/frontend.featurize_batch); T frames
        # at 10 ms hop / 25 ms window -> flen + T*fstride samples
        S = 400 + T * 160
        batch = (jnp.asarray(0.1 * rng.standard_normal((B, S, 1, 1)),
                             jnp.float32),
                 jnp.full((B,), S, jnp.int32),
                 jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
                 jnp.full((B,), L, jnp.int32))
    else:
        batch = (jnp.asarray(rng.standard_normal((B, T, 13, 3)), jnp.float32),
                 jnp.full((B,), T, jnp.int32),
                 jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
                 jnp.full((B,), L, jnp.int32))
    K = 8  # steps per dispatch: ONE device call runs K optimizer steps
    stacked = tuple(jnp.stack([b] * K) for b in batch)
    for dtype in ("float32", "bfloat16"):
        cfg = Config(unit="char", vocab_size=30, feat_dim=13, enc_type="cnn",
                     attention_size=128, mode="add", dropout_rate=0.0,
                     scheduled_sampling=False, apply_bn=False, lr=1e-4,
                     dtype=dtype, scan_unroll=unroll,
                     audio_shards=from_audio, **size)
        ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=L)
        loss0 = float(jax.device_get(m["loss"]))
        print(f"{dtype}: compile+first {time.perf_counter()-t0:.1f}s "
              f"loss {loss0:.4f}")
        # chained single steps measure the TUNNEL, not the chip: feeding a
        # dispatch's output TrainState back as input round-trips hundreds
        # of MB through the host on this dev platform (CLAUDE.md).  The
        # production path (--steps_per_dispatch) scans K steps per
        # dispatch; time that and report per-step cost.
        ts2, metrics = trainer.train_multi_step(ts, stacked, cfg, L)
        float(jax.device_get(metrics["loss"][-1]))  # compile
        t0 = time.perf_counter()
        _, metrics = trainer.train_multi_step(ts2, stacked, cfg, L)
        loss = float(jax.device_get(metrics["loss"][-1]))  # forces chain
        dt = (time.perf_counter() - t0) / K
        print(f"{dtype}: {dt*1e3:.1f} ms/step ({B/dt:.1f} utt/s) "
              f"loss {loss:.4f}  [K={K} steps/dispatch]")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--unroll", type=int, default=1,
                    help="lax.scan unroll factor for the RNN/decoder scans")
    ap.add_argument("--skip_scan_overhead", action="store_true")
    ap.add_argument("--audio", action="store_true",
                    help="raw-waveform batches (--audio_shards): measures "
                         "the fused in-step frontend's marginal cost")
    args = ap.parse_args()
    print("devices:", jax.devices())
    if not args.skip_scan_overhead:
        scan_overhead()
    train_bench(args.quick, unroll=args.unroll, from_audio=args.audio)
