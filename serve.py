"""HTTP serving front-end: dynamic-batching ASR over a trained checkpoint.

No reference equivalent — the reference's only inference surfaces are the
offline eval scripts (test.py / decode.py, batch-1 host-loop beam).  This
driver exposes the framework's on-TPU batched decode as a service:

    python serve.py --save_dir ./model/las --unit char --port 8000
    curl -s -X POST --data-binary @utt.flac localhost:8000/transcribe

Endpoints (stdlib http.server; no external dependencies):
  POST /transcribe   body = WAV or FLAC bytes -> {"text": ...}
                     or JSON {"signal": [...floats], "sample_rate": N}
  GET  /healthz      liveness + device info
  GET  /stats        batching/latency counters (ServingStats.snapshot)

Concurrent requests are coalesced by serving.BatchingRecognizer into
length-bucketed, fixed-size batches — one device dispatch each — with
every (bucket, batch) program compiled at startup (--warmup).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import tempfile

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import numpy as np

from automatic_speech_recognition_tpu.api import Recognizer
from automatic_speech_recognition_tpu.config import Config, build_parser
from automatic_speech_recognition_tpu.data.audio_io import read_audio
from automatic_speech_recognition_tpu.serving import BatchingRecognizer

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("serve")

SERVE_FLAGS = ("host", "port", "max_batch", "max_wait_ms", "warmup")


def parse(argv=None):
    p = build_parser()
    g = p.add_argument_group("serving")
    g.add_argument("--host", type=str, default="127.0.0.1")
    g.add_argument("--port", type=int, default=8000)
    g.add_argument("--max_batch", type=int, default=8,
                   help="signals per device dispatch (one jit key)")
    g.add_argument("--max_wait_ms", type=float, default=20.0,
                   help="max time a request waits for batch co-riders")
    g.add_argument("--warmup", type=int, default=1,
                   help="compile every bucket program before accepting "
                        "traffic (1) or lazily on first use (0)")
    ns = vars(p.parse_args(argv))
    serve_opts = {k: ns.pop(k) for k in SERVE_FLAGS}
    return Config(**ns), serve_opts


def decode_body(body: bytes, content_type: str, expect_sr: int) -> np.ndarray:
    """Request body -> float32 waveform at the model's sample rate."""
    if content_type.startswith("application/json"):
        obj = json.loads(body)
        sr = int(obj.get("sample_rate", expect_sr))
        if sr != expect_sr:
            raise ValueError(f"sample rate {sr} != model's {expect_sr}")
        return np.asarray(obj["signal"], np.float32)
    # audio container: sniff WAV/FLAC via the same reader the pipeline uses
    suffix = ".wav" if body[:4] == b"RIFF" else ".flac"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(body)
        path = f.name
    try:
        sig, sr = read_audio(path)
    finally:
        os.unlink(path)
    if sr != expect_sr:
        raise ValueError(f"sample rate {sr} != model's {expect_sr}")
    return np.asarray(sig, np.float32)


def make_handler(server: BatchingRecognizer, sample_rate: int):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, obj) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "devices": [str(d) for d in jax.devices()]})
            elif self.path == "/stats":
                self._reply(200, server.stats.snapshot())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/transcribe":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                sig = decode_body(
                    body, self.headers.get("Content-Type", ""), sample_rate)
            except Exception as e:
                # bad payload (malformed JSON/audio, wrong rate, too long):
                # the CLIENT's fault
                self._reply(400, {"error": str(e)})
                return
            try:
                text = server.transcribe(sig)
                self._reply(200, {"text": text})
            except ValueError as e:
                # submit()'s oversize-signal rejection: client's fault
                self._reply(400, {"error": str(e)})
            except Exception as e:
                # transcription-path failure (device error, shutdown): the
                # SERVER's fault — 503 so balancers retry elsewhere
                self._reply(503, {"error": str(e)})

        def log_message(self, fmt, *args):
            log.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main(argv=None):
    cfg, opts = parse(argv)
    rec = Recognizer.from_checkpoint(
        cfg.save_dir, cfg, epoch=cfg.restore_epoch,
        lm_dir=cfg.lm_dir if cfg.apply_lm else "")
    server = BatchingRecognizer(
        rec, max_batch=opts["max_batch"], max_wait_ms=opts["max_wait_ms"],
        beam_size=cfg.beam_size if cfg.beam_size > 1 else 0).start()
    if opts["warmup"]:
        log.info("warming %d bucket programs (batch %d)...",
                 len(server.bucket_seconds), server.max_batch)
        server.warmup()
        log.info("warmup done")

    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer((opts["host"], opts["port"]),
                                make_handler(server, cfg.sample_rate))
    log.info("serving on %s:%d (buckets %s s, max_batch %d, wait %.0f ms)",
             opts["host"], opts["port"], server.bucket_seconds,
             server.max_batch, opts["max_wait_ms"])
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        server.stop()


if __name__ == "__main__":
    main()
