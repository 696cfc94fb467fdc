"""Contention-survivable bench capture (bench.py v3, round 5).

Round-4 post-mortem: the driver's round-end bench run died with
`parsed: null` when a study chain owned the chip (BENCH_r04.json).  The
capture path now guarantees one parseable JSON line whenever a device
number lands OR a cached result exists.  These tests drive bench.py as
a subprocess on the CPU backend with tiny work sizes — the same code
path the driver runs, minus the real chip.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "benchmarks", "bench_cache.json")


def run_bench(tmp_path, extra_env, keep_cache=None):
    """Run bench.py with benchmarks/ redirected via a scratch copy of the
    repo-root entry (cache writes land in the real benchmarks/, so tests
    that exercise the cache save/restore snapshot and restore it)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               ASR_BENCH_KAMP="2", ASR_BENCH_REPS="1",
               ASR_BENCH_CPU_PASSES="1", **extra_env)
    return subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, env=env,
                          timeout=900, cwd=REPO)


@pytest.fixture
def cache_guard():
    """Snapshot and restore the real cache file around a test."""
    saved = None
    if os.path.exists(CACHE):
        saved = CACHE + ".testbak"
        shutil.move(CACHE, saved)
    try:
        yield
    finally:
        if os.path.exists(CACHE):
            os.remove(CACHE)
        if saved:
            shutil.move(saved, CACHE)


def last_json_line(out):
    lines = [l for l in out.splitlines() if l.startswith("{")]
    assert lines, out
    return json.loads(lines[-1])


def test_normal_run_emits_full_result_and_no_cpu_cache(tmp_path, cache_guard):
    r = run_bench(tmp_path, {})
    assert r.returncode == 0, r.stderr[-1500:]
    d = last_json_line(r.stdout)
    assert d["metric"] == "frontend_utts_per_sec"
    assert d["device_ms_per_batch"] > 0
    assert d["cpu_utts_per_sec_live"] > 0
    assert "stale" not in d
    # CPU-mode runs must NOT seed the stale-fallback cache: a cached CPU
    # number served as a TPU capture would be worse than no number
    assert not os.path.exists(CACHE)


def test_stall_serves_cache_with_stale_tag(tmp_path, cache_guard):
    cached = {"metric": "frontend_utts_per_sec", "value": 12345.0,
              "unit": "utt/s", "vs_baseline": 116.4, "spread_pct": 1.0,
              "device_ms_per_batch": 10.37,
              "cpu_utts_per_sec_pinned": 106.1, "backend": "tpu"}
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(CACHE, "w") as f:
        json.dump(cached, f)
    # 1-second stall budget: the device compile can't finish, so the
    # watchdog must emit the cached result (exit 0, stale-tagged),
    # never `parsed: null`
    r = run_bench(tmp_path, {"ASR_BENCH_TIMEOUT": "1"})
    assert r.returncode == 0, (r.returncode, r.stderr[-1500:])
    d = last_json_line(r.stdout)
    assert d["stale"] is True
    assert d["value"] == 12345.0
    assert d["stale_reason"].startswith("stall_in_")
    # the lockfile must not leak through the os._exit path
    assert not os.path.exists("/tmp/asr_bench_running.lock")


def test_stall_with_no_cache_exits_3(tmp_path, cache_guard):
    r = run_bench(tmp_path, {"ASR_BENCH_TIMEOUT": "1"})
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr[-800:])
    assert not [l for l in r.stdout.splitlines() if l.startswith("{")]
