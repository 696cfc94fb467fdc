"""Headline benchmark: on-TPU fused acoustic frontend throughput.

The reference extracts MFCC+CMVN+delta/delta-delta features in a per-utterance
CPU speechpy loop (reference preprocess.py:50-91); BASELINE.md's north-star
target is >=50x that throughput.  This benchmark measures:

- baseline: the NumPy speechpy-semantics pipeline (ops/frontend_host.py),
  one utterance at a time on the host — a faithful stand-in for the
  reference's hot loop (same math, same output).  32 utterances per pass,
  median of 5 passes.
- candidate: the batched, jitted frontend (Pallas kernel on TPU, XLA
  elsewhere) measured in DEVICE time via K-amplification: the body runs
  K times inside one jitted program with a serializing scalar carry, and
  per-batch time is (t_K - t_1)/(K - 1).  Per-dispatch wall timing on the
  tunneled platform swings +-20% (dispatch RPC floor ~25-30 ms dwarfs a
  ~2 ms kernel; see benchmarks/RESULTS.md "Dispatch floor" and the int8
  study that falsified wall-clock A/Bs) — K-amplification cancels the
  floor exactly and is the methodology every other bench in this repo
  trusts (decoder_profile.py, frontend_probe.py).  On co-located TPU
  hosts the dispatch floor does not exist, so device time IS the
  production number.  Both sides report the best of repeated windows
  (contention on a shared host/chip is strictly additive) plus the
  min..max spread, so a regression is distinguishable from a noisy
  window.

Comparability across rounds (round-3 verdict, Weak #1): `vs_baseline` is
computed against a PINNED CPU constant measured once on this host
(best-of-9 windows; see PINNED_CPU_UTTS_PER_SEC), so the recorded
speedup moves only when the device kernel does.  A live CPU measurement
still runs each invocation — best-of-windows, the SAME reducer as the
device side — and is printed alongside the pin; if live drifts far from
the pin the host changed and the constant should be re-measured (the
drift is visible in the output either way).  The primary stable metric
is `device_ms_per_batch`.

Prints ONE JSON line:
  {"metric": "frontend_utts_per_sec", "value": N, "unit": "utt/s",
   "vs_baseline": speedup vs PINNED cpu, "spread_pct": device spread,
   "device_ms_per_batch": N (primary stable metric),
   "cpu_utts_per_sec_pinned": pin, "cpu_utts_per_sec_live": live}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Watchdog: on tunneled platforms even jax.devices() can hang when the
# remote service is unavailable; a silent hang is the worst outcome for
# an automated runner, so abort loudly after ASR_BENCH_TIMEOUT seconds
# with no progress (0 disables).  Thread-based, NOT SIGALRM: a dead
# tunnel wedges the host INSIDE a blocking C++ device call, and CPython
# only runs signal handlers between bytecodes — which is exactly what
# never happens there (utils/watchdog.py; observed live on a multi-hour
# outage).  Re-armed at every phase boundary (heartbeat), so a
# legitimately slow remote compile only has to finish within one
# window — the bound is per-phase stall, not total wall time.
_TIMEOUT_S = int(os.environ.get("ASR_BENCH_TIMEOUT", "1500"))
if _TIMEOUT_S > 0:
    from automatic_speech_recognition_tpu.utils.watchdog import StallWatchdog

    def _abort(stalled_for):
        print(f"bench.py: no progress for {stalled_for:.0f}s "
              f"(timeout {_TIMEOUT_S}s); aborting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    _wd = StallWatchdog(_TIMEOUT_S, what="bench phase",
                        on_stall=_abort).start()

    def _heartbeat():
        _wd.pet()
else:
    def _heartbeat():
        pass


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.ops import frontend, frontend_host
from automatic_speech_recognition_tpu.utils.kamp import reduce_minmin

SAMPLE_RATE = 16000
UTT_SECONDS = 10.0
FEAT_DIM = 13
BATCH = 128
CPU_UTTS = 32
CPU_PASSES = 7
K_AMP = 32
DEVICE_REPS = 7

# The recorded denominator.  Measured 2026-08-19 on this bench host
# (best of 9 windows of the 32-utt seeded set below: 96.7..106.1 utt/s)
# — the per-utterance NumPy speechpy-semantics loop, the reference's hot
# path (reference preprocess.py:50-91).  Re-measure ONLY when the host
# changes; round-over-round `vs_baseline` is comparable because this
# constant does not move with host load (r02/r03 re-measured it live at
# 168.6/94.7 on a contended shared box, which moved the recorded speedup
# 1.8x with zero kernel change).
PINNED_CPU_UTTS_PER_SEC = 106.1


def make_audio(n, seconds, rng):
    s = int(seconds * SAMPLE_RATE)
    return (rng.standard_normal((n, s)) * 0.1).astype(np.float32)


def bench_cpu(audio):
    """Best-of-passes throughput over CPU_UTTS utterances (noise on a
    shared host is strictly additive, so max rate estimates the
    uncontended baseline; the spread shows how contended the host was)."""
    rates = []
    for _ in range(CPU_PASSES):
        t0 = time.perf_counter()
        for i in range(audio.shape[0]):
            frontend_host.process_audio(
                audio[i], sample_rate=SAMPLE_RATE, feat_dim=FEAT_DIM,
                feat_type="mfcc", apply_cmvn=True)
        dt = time.perf_counter() - t0
        rates.append(audio.shape[0] / dt)
        _heartbeat()
    rates = np.asarray(rates)
    spread = float((rates.max() - rates.min()) / rates.max()) * 100.0
    return float(rates.max()), spread


def _timed(fn, n=3):
    """Median wall time of fn(); forces completion via a data-dependent
    scalar device_get (block_until_ready can return early on tunneled
    TPU platforms)."""
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def bench_device(audio):
    """K-amplified device time per batch: run the frontend k times inside
    one program, serialized by a scalar carry (no CSE, no overlap); the
    dispatch floor cancels in (t_K - t_1)/(K - 1)."""
    audiolen = jnp.full((audio.shape[0],), audio.shape[1], jnp.int32)
    x = jax.device_put(jnp.asarray(audio))

    use_pallas = jax.default_backend() == "tpu"  # production default path

    def make(k):
        @jax.jit
        def f(a):
            def it(i, acc):
                feats, _ = frontend.extract_features(
                    a + acc * 1e-30, audiolen, sample_rate=SAMPLE_RATE,
                    feat_dim=FEAT_DIM, feat_type="mfcc", apply_cmvn=True,
                    use_pallas=use_pallas)
                return acc + feats[0, 0, 0, 0]
            return jax.lax.fori_loop(0, k, it, 0.0)
        return f

    f1, fK = make(1), make(K_AMP)
    float(jax.device_get(f1(x)))   # compile
    _heartbeat()
    float(jax.device_get(fK(x)))   # compile
    _heartbeat()

    # The tunneled chip is time-shared and contention is strictly
    # ADDITIVE on each absolute timing, so min-over-windows of t1 and of
    # tK separately estimate the uncontended times; differencing the
    # PAIRED windows instead lets t1's noise enter with negative sign
    # and biases the min of the differences downward (measured: 36-155%
    # spread).  Estimator: dt = (min tK - min t1)/(K-1).  Spread =
    # relative gap between the same estimator on the even and odd
    # window subsets — the stability of the NUMBER, not the raw
    # contention envelope.
    t1s, tKs = [], []
    for _ in range(DEVICE_REPS):
        t1s.append(_timed(lambda: f1(x)))
        tKs.append(_timed(lambda: fK(x)))
        _heartbeat()
    dt, spread = reduce_minmin(t1s, tKs, K_AMP, what="bench.py device")
    return audio.shape[0] / dt, spread, dt


def main():
    rng = np.random.default_rng(0)
    cpu_rate, cpu_spread = bench_cpu(make_audio(CPU_UTTS, UTT_SECONDS, rng))
    _heartbeat()  # CPU baseline done
    dev_rate, dev_spread, dt = bench_device(
        make_audio(BATCH, UTT_SECONDS, rng))
    print(json.dumps({
        "metric": "frontend_utts_per_sec",
        "value": round(dev_rate, 2),
        "unit": "utt/s",
        "vs_baseline": round(dev_rate / PINNED_CPU_UTTS_PER_SEC, 2),
        "spread_pct": round(dev_spread, 1),
        "device_ms_per_batch": round(dt * 1e3, 3),
        "cpu_utts_per_sec_pinned": PINNED_CPU_UTTS_PER_SEC,
        "cpu_utts_per_sec_live": round(cpu_rate, 2),
        "cpu_spread_pct": round(cpu_spread, 1),
    }))


if __name__ == "__main__":
    main()
