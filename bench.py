"""Headline benchmark: on-TPU fused acoustic frontend throughput.

The reference extracts MFCC+CMVN+delta/delta-delta features in a per-utterance
CPU speechpy loop (reference preprocess.py:50-91); BASELINE.md's north-star
target is >=50x that throughput.  This benchmark measures:

- candidate (PRIMARY, measured first): the batched, jitted frontend
  (Pallas kernel on TPU, XLA elsewhere) measured in DEVICE time via
  K-amplification: the body runs K times inside one jitted program with
  a serializing scalar carry, and per-batch time is (t_K - t_1)/(K - 1).
  Per-dispatch wall timing on the tunneled platform swings +-20%
  (dispatch RPC floor ~25-30 ms dwarfs a ~2 ms kernel; see
  benchmarks/RESULTS.md "Dispatch floor") — K-amplification cancels the
  floor exactly.  Estimator: dt = (min tK - min t1)/(K-1) over windows
  (contention on the time-shared chip is strictly additive, so min
  estimates the uncontended time; utils/kamp.py).
- baseline (advisory, measured second): the NumPy speechpy-semantics
  pipeline (ops/frontend_host.py), one utterance at a time on the host —
  the reference's hot loop.  `vs_baseline` uses a PINNED constant
  (PINNED_CPU_UTTS_PER_SEC, measured once on this host) so the recorded
  speedup moves only when the device kernel does; the live number is
  printed alongside for drift detection.

Contention survivability (round-4 post-mortem: BENCH_r04.json died with
"no progress for 1505s" while a builder training job owned the chip and
the compile service was contended — the round recorded NO perf number):

1. Device phase runs FIRST — the primary metric lands before anything
   optional can stall.
2. The stall watchdog EMITS A PARTIAL RESULT instead of dying empty:
   if the device number landed, print it (cpu_live fields null); if it
   did not, print the last fully-successful run from
   benchmarks/bench_cache.json tagged "stale": true.  Exit 0 either
   way — `parsed: null` can no longer happen once one good run exists.
3. Every successful full run refreshes the cache.
4. A lockfile (/tmp/asr_bench_running.lock) is held for the duration;
   study-chain scripts check it between stages and idle while the bench
   owns the capture window (tools/round5_chain.sh), so a builder job
   can no longer saturate the chip mid-capture.

Prints ONE JSON line:
  {"metric": "frontend_utts_per_sec", "value": N, "unit": "utt/s",
   "vs_baseline": speedup vs PINNED cpu, "spread_pct": device spread,
   "device_ms_per_batch": N (primary stable metric),
   "cpu_utts_per_sec_pinned": pin, "cpu_utts_per_sec_live": live|null,
   "stale": present+true only when served from cache}
"""

from __future__ import annotations

import atexit
import json
import os
import sys
import threading
import time

import numpy as np

SAMPLE_RATE = 16000
UTT_SECONDS = 10.0
FEAT_DIM = 13
BATCH = 128
CPU_UTTS = 32
CPU_PASSES = int(os.environ.get("ASR_BENCH_CPU_PASSES", "5"))
K_AMP = int(os.environ.get("ASR_BENCH_KAMP", "32"))
DEVICE_REPS = int(os.environ.get("ASR_BENCH_REPS", "5"))

# The recorded denominator.  Measured 2026-08-19 on this bench host
# (best of 9 windows of the 32-utt seeded set below: 96.7..106.1 utt/s)
# — the per-utterance NumPy speechpy-semantics loop, the reference's hot
# path (reference preprocess.py:50-91).  Re-measure ONLY when the host
# changes (procedure: docs/OPERATIONS.md "Pinned denominator");
# round-over-round `vs_baseline` is comparable because this constant
# does not move with host load.
PINNED_CPU_UTTS_PER_SEC = 106.1

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", "bench_cache.json")
LOCKFILE = "/tmp/asr_bench_running.lock"

# ---- single-emission machinery ------------------------------------------

_emit_lock = threading.Lock()
_emitted = False
_partial: dict = {}   # fields filled in as phases land


def _emit(result: dict) -> bool:
    """Print the one JSON line exactly once (main thread or watchdog)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return False
        _emitted = True
    print(json.dumps(result))
    sys.stdout.flush()
    return True


def _load_cache() -> dict | None:
    try:
        with open(CACHE) as f:
            d = json.load(f)
        return d if d.get("device_ms_per_batch") else None
    except (OSError, ValueError):
        return None


def _save_cache(result: dict) -> None:
    try:
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        tmp = CACHE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.replace(tmp, CACHE)
    except OSError as e:
        print(f"bench.py: cache write failed: {e}", file=sys.stderr)


def _emit_partial_and_exit(reason: str) -> None:
    """Best-available result on stall: live-partial beats cache beats
    nothing.  Runs on the watchdog thread while the main thread may be
    wedged inside a C++ dispatch, hence os._exit — which skips atexit,
    so the chain-idle lockfile must be removed here explicitly."""
    try:
        if os.path.exists(LOCKFILE):
            os.remove(LOCKFILE)
    except OSError:
        pass
    if _partial.get("device_ms_per_batch") is not None:
        out = dict(_partial)
        out.setdefault("cpu_utts_per_sec_live", None)
        out.setdefault("cpu_spread_pct", None)
        out["partial"] = reason
        _emit(out)
        os._exit(0)
    cached = _load_cache()
    if cached is not None:
        cached = dict(cached)
        cached["stale"] = True
        cached["stale_reason"] = reason
        _emit(cached)
        os._exit(0)
    print(f"bench.py: stalled ({reason}) with no partial and no cache",
          file=sys.stderr)
    os._exit(3)


# Watchdog: on tunneled platforms even jax.devices() can hang when the
# remote service is unavailable.  Thread-based, NOT SIGALRM: a dead
# tunnel wedges the host INSIDE a blocking C++ device call, and CPython
# only runs signal handlers between bytecodes (utils/watchdog.py).
# Re-armed at every phase boundary, so a legitimately slow remote
# compile only has to finish within one window.
_TIMEOUT_S = int(os.environ.get("ASR_BENCH_TIMEOUT", "1500"))
_phase = ["startup"]
if _TIMEOUT_S > 0:
    from automatic_speech_recognition_tpu.utils.watchdog import StallWatchdog

    def _abort(stalled_for):
        print(f"bench.py: no progress for {stalled_for:.0f}s in phase "
              f"'{_phase[0]}' (timeout {_TIMEOUT_S}s); emitting best "
              "available result", file=sys.stderr)
        sys.stderr.flush()
        _emit_partial_and_exit(f"stall_in_{_phase[0]}")

    _wd = StallWatchdog(_TIMEOUT_S, what="bench phase",
                        on_stall=_abort).start()

    def _heartbeat(phase=None):
        if phase is not None:
            _phase[0] = phase
        _wd.pet()
else:
    def _heartbeat(phase=None):
        if phase is not None:
            _phase[0] = phase


def _hold_lock():
    """Signal chain scripts to idle while the bench owns the chip."""
    try:
        with open(LOCKFILE, "w") as f:
            f.write(str(os.getpid()))
        atexit.register(lambda: os.path.exists(LOCKFILE)
                        and os.remove(LOCKFILE))
    except OSError:
        pass


_hold_lock()

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.ops import frontend, frontend_host
from automatic_speech_recognition_tpu.utils.kamp import reduce_minmin


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
    _heartbeat("device_transfer")
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
    _heartbeat("device_compile_f1")
    float(jax.device_get(f1(x)))   # compile
    _heartbeat("device_compile_fK")
    float(jax.device_get(fK(x)))   # compile
    _heartbeat("device_windows")

    # min-min estimator over separate windows; see utils/kamp.py for why
    # paired differencing is biased on a time-shared chip.
    t1s, tKs = [], []
    for _ in range(DEVICE_REPS):
        t1s.append(_timed(lambda: f1(x)))
        tKs.append(_timed(lambda: fK(x)))
        _heartbeat()
    dt, spread = reduce_minmin(t1s, tKs, K_AMP, what="bench.py device")
    return audio.shape[0] / dt, spread, dt


def main():
    rng = np.random.default_rng(0)
    dev_audio_rng = np.random.default_rng(1)

    # PRIMARY metric first: if anything after this stalls, the partial
    # emission path still reports the device number.
    dev_rate, dev_spread, dt = bench_device(
        make_audio(BATCH, UTT_SECONDS, dev_audio_rng))
    _partial.update({
        "metric": "frontend_utts_per_sec",
        "value": round(dev_rate, 2),
        "unit": "utt/s",
        "vs_baseline": round(dev_rate / PINNED_CPU_UTTS_PER_SEC, 2),
        "spread_pct": round(dev_spread, 1),
        "device_ms_per_batch": round(dt * 1e3, 3),
        "cpu_utts_per_sec_pinned": PINNED_CPU_UTTS_PER_SEC,
    })

    _heartbeat("cpu_baseline")
    cpu_rate, cpu_spread = bench_cpu(make_audio(CPU_UTTS, UTT_SECONDS, rng))

    result = dict(_partial)
    result["cpu_utts_per_sec_live"] = round(cpu_rate, 2)
    result["cpu_spread_pct"] = round(cpu_spread, 1)
    # Only a real-device run may seed the stale-fallback cache: serving
    # a CPU-mode number as a TPU capture would be worse than serving
    # nothing.
    if jax.default_backend() != "cpu":
        result_c = dict(result)
        result_c["backend"] = jax.default_backend()
        _save_cache(result_c)
    _emit(result)


if __name__ == "__main__":
    main()
