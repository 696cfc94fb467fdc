"""Serving layer: dynamic batching, bucketing, HTTP endpoint.

The reference has no serving path (its decode.py is an offline batch-1
loop); these tests pin the TPU-native serving additions
(automatic_speech_recognition_tpu/serving.py, serve.py).
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from automatic_speech_recognition_tpu.api import Recognizer
from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.serving import BatchingRecognizer


SR = 16000


def tiny_recognizer():
    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
                 enc_units=16, num_enc_channels=4, num_enc_layers=1,
                 dec_units=16, num_dec_layers=1, embedding_size=8,
                 attention_size=8, mode="add", dropout_rate=0.0,
                 scheduled_sampling=False, apply_bn=False,
                 max_audio_seconds=8.0, use_pallas=False)
    from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder
    params, bn_state = las.las_init(jax.random.PRNGKey(0), cfg)
    return Recognizer(params, bn_state, cfg, CharEncoder())


class FakeRecognizer:
    """Routing/batching logic test double: no jax, echoes signal lengths."""

    class _Cfg:
        sample_rate = SR
        max_audio_seconds = 8.0

    cfg = _Cfg()

    def __init__(self):
        self.calls = []  # (n_signals, pad_seconds)
        self.lock = threading.Lock()

    def transcribe_signals(self, signals, beam_size=0, pad_seconds=0):
        with self.lock:
            self.calls.append((len(signals), pad_seconds))
        return [f"len={len(s)}" for s in signals]


def test_batcher_routes_results_to_the_right_futures():
    fake = FakeRecognizer()
    with BatchingRecognizer(fake, max_batch=4, max_wait_ms=5) as srv:
        sigs = [np.zeros(SR // 2 + i, np.float32) for i in range(16)]
        futs = [srv.submit(s) for s in sigs]
        texts = [f.result(timeout=10) for f in futs]
    assert texts == [f"len={SR // 2 + i}" for i in range(16)]
    # every dispatch was padded up to max_batch (one jit key)
    assert all(n == 4 for n, _ in fake.calls)


def test_batcher_buckets_by_length_and_pins_pad_seconds():
    fake = FakeRecognizer()
    with BatchingRecognizer(fake, max_batch=2, max_wait_ms=5,
                            bucket_seconds=(1, 2, 4, 8)) as srv:
        short = [srv.submit(np.zeros(SR // 2, np.float32)) for _ in range(2)]
        long = [srv.submit(np.zeros(3 * SR, np.float32)) for _ in range(2)]
        [f.result(timeout=10) for f in short + long]
    pads = sorted(p for _, p in fake.calls)
    assert pads == [1, 4]  # 0.5 s -> 1 s bucket; 3 s -> 4 s bucket


def test_batcher_flushes_a_partial_batch_after_max_wait():
    fake = FakeRecognizer()
    with BatchingRecognizer(fake, max_batch=8, max_wait_ms=30) as srv:
        t0 = time.monotonic()
        fut = srv.submit(np.zeros(SR, np.float32))
        assert fut.result(timeout=10) == f"len={SR}"
        waited = time.monotonic() - t0
    assert waited >= 0.02  # honored the batching window
    assert fake.calls[0][0] == 8  # still padded up to max_batch


def test_oversize_signal_is_rejected():
    fake = FakeRecognizer()
    srv = BatchingRecognizer(fake, bucket_seconds=(1, 2)).start()
    try:
        with pytest.raises(ValueError, match="exceeds the largest bucket"):
            srv.submit(np.zeros(5 * SR, np.float32))
    finally:
        srv.stop()


def test_stop_fails_pending_requests_instead_of_hanging():
    class Slow(FakeRecognizer):
        def transcribe_signals(self, signals, beam_size=0, pad_seconds=0):
            time.sleep(0.2)
            return super().transcribe_signals(signals, beam_size, pad_seconds)

    srv = BatchingRecognizer(Slow(), max_batch=1, max_wait_ms=1).start()
    futs = [srv.submit(np.zeros(SR, np.float32)) for _ in range(4)]
    srv.stop()
    # all futures resolve: earlier ones with results, queued ones with the
    # shutdown error — none hang
    outcomes = []
    for f in futs:
        try:
            outcomes.append(f.result(timeout=5))
        except RuntimeError as e:
            outcomes.append(str(e))
    assert any("server stopped" in str(o) or "len=" in str(o)
               for o in outcomes)
    assert len(outcomes) == 4


def test_real_model_end_to_end_through_the_batcher():
    """Full path on the real (tiny) model: frontend -> greedy -> detok."""
    rec = tiny_recognizer()
    rng = np.random.default_rng(0)
    sigs = [rng.standard_normal(int(SR * s)).astype(np.float32) * 0.1
            for s in (0.5, 0.9, 1.7)]
    direct = {}
    with BatchingRecognizer(rec, max_batch=2, max_wait_ms=10,
                            bucket_seconds=(1, 2, 4, 8)) as srv:
        futs = [srv.submit(s) for s in sigs]
        served = [f.result(timeout=120) for f in futs]
        # direct calls with the same bucket padding must agree exactly
        direct[0] = rec.transcribe_signals([sigs[0], sigs[1]], pad_seconds=1)
        direct[2] = rec.transcribe_signals([sigs[2], sigs[2]], pad_seconds=2)
    assert served[0] == direct[0][0]
    assert served[1] == direct[0][1]
    assert served[2] == direct[2][0]
    snap = srv.stats.snapshot()
    assert snap["requests"] == 3 and snap["errors"] == 0
    assert snap["batches"] >= 2


def test_warmup_compiles_every_bucket_without_polluting_stats():
    fake = FakeRecognizer()
    srv = BatchingRecognizer(fake, max_batch=2, bucket_seconds=(1, 2))
    srv.warmup()  # no .start() needed: dispatch runs inline
    # one dispatch per bucket, padded to max_batch, pinned to the bucket
    assert sorted(fake.calls) == [(2, 1), (2, 2)]
    # warmup latencies (compile time!) must NOT enter the /stats reservoir
    snap = srv.stats.snapshot()
    assert snap["batches"] == 0 and snap["requests"] == 0

    # and the real (tiny) model path still compiles+runs through warmup
    srv2 = BatchingRecognizer(tiny_recognizer(), max_batch=2,
                              bucket_seconds=(1,))
    srv2.warmup()
    assert srv2.stats.snapshot()["requests"] == 0


def test_cancelled_future_does_not_poison_co_riders():
    """A request cancelled while queued is dropped; its batch co-riders
    still get their transcripts (set_running_or_notify_cancel guard)."""
    fake = FakeRecognizer()
    srv = BatchingRecognizer(fake, max_batch=4, max_wait_ms=60)
    srv.start()
    try:
        f_cancel = srv.submit(np.zeros(SR // 2, np.float32))
        assert f_cancel.cancel()  # still PENDING inside the wait window
        riders = [srv.submit(np.zeros(SR // 2 + 1 + i, np.float32))
                  for i in range(2)]
        texts = [f.result(timeout=10) for f in riders]
        assert texts == [f"len={SR // 2 + 1 + i}" for i in range(2)]
    finally:
        srv.stop()


def test_submit_after_stop_raises_instead_of_hanging():
    srv = BatchingRecognizer(FakeRecognizer()).start()
    srv.stop()
    with pytest.raises(RuntimeError, match="not started"):
        srv.submit(np.zeros(SR, np.float32))


def test_expired_request_beats_a_full_bucket():
    """Sustained load on one bucket must not starve an aged request in
    another bucket past its max_wait deadline."""
    flushed = []

    class Recording(FakeRecognizer):
        def transcribe_signals(self, signals, beam_size=0, pad_seconds=0):
            flushed.append(pad_seconds)
            time.sleep(0.01)
            return super().transcribe_signals(signals, beam_size,
                                              pad_seconds)

    srv = BatchingRecognizer(Recording(), max_batch=2, max_wait_ms=40,
                             bucket_seconds=(1, 4))
    lone = _make_lone_request(srv)
    srv.start()
    try:
        # keep the 1s bucket permanently full while the lone 4s request ages
        stop_feeding = time.monotonic() + 0.5
        fast = []
        while time.monotonic() < stop_feeding and not lone.future.done():
            fast.append(srv.submit(np.zeros(SR // 2, np.float32)))
            time.sleep(0.002)
        assert lone.future.result(timeout=10) == f"len={2 * SR}"
        for f in fast:
            f.result(timeout=10)
    finally:
        srv.stop()
    assert 4 in flushed  # the aged bucket was flushed despite full-bucket load


def _make_lone_request(srv):
    """Enqueue a 4s-bucket request before start() so it is oldest."""
    from automatic_speech_recognition_tpu.serving import _Request
    req = _Request(np.zeros(2 * SR, np.float32), 4)
    srv._queue.append(req)
    srv._accepting = True
    return req


def test_http_server_round_trip():
    """serve.py handler over a real localhost socket (loopback only)."""
    from http.server import ThreadingHTTPServer
    import serve as serve_mod

    rec = tiny_recognizer()
    srv = BatchingRecognizer(rec, max_batch=2, max_wait_ms=5,
                             bucket_seconds=(1, 2, 4, 8)).start()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_mod.make_handler(srv, SR))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        sig = (np.random.default_rng(1).standard_normal(SR // 2)
               .astype(np.float32) * 0.1)
        body = json.dumps({"signal": sig.tolist(),
                           "sample_rate": SR}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            text = json.loads(r.read())["text"]
        assert text == rec.transcribe_signals([sig, sig], pad_seconds=1)[0]

        # wrong sample rate -> 400 with a useful error
        bad = json.dumps({"signal": [0.0] * 100,
                          "sample_rate": 8000}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=bad,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "sample rate" in json.loads(e.read())["error"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            snap = json.loads(r.read())
        assert snap["requests"] >= 1
    finally:
        httpd.shutdown()
        httpd.server_close()
        srv.stop()
