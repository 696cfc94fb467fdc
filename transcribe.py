"""Transcribe audio files with a trained model — one command.

The reference's closest surface is decode.py, which consumes the .npy
feature dumps preprocess.py left behind (reference decode.py:80-89);
there is no files-in/text-out tool.  transcribe.py is that tool:

    python transcribe.py recordings/ --save_dir exp/model \
        --use_saved_config True --beam_size 8 --beam_logprob True

Each path may be a WAV/FLAC file, a directory (searched recursively for
*.wav/*.flac), or a shell-style glob.  Output is one "path<TAB>text"
line per file, to stdout or --output.  Decoding is batched through
api.Recognizer (length-sorted, shape-quantized batches — a directory of
files decodes in a handful of device calls); greedy by default,
--beam_size > 1 switches to the on-device beam with every beam flag
honored (--beam_logprob, --beam_len_penalty, --beam_coverage_reward,
--apply_lm --lm_dir ... shallow fusion).
"""

from __future__ import annotations

import glob
import logging
import os
import sys

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen

from automatic_speech_recognition_tpu.api import Recognizer
from automatic_speech_recognition_tpu.config import (
    Config, apply_saved_model_config, build_parser)

# stderr, NOT the other CLIs' stdout: this tool's data product
# (path<TAB>text lines) goes to stdout by default and must stay clean
logging.basicConfig(force=True, stream=sys.stderr, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("transcribe")

AUDIO_EXTS = (".wav", ".flac")


def parse(argv=None):
    p = build_parser()
    g = p.add_argument_group("transcribe")
    g.add_argument("paths", nargs="+",
                   help="audio files, directories, or globs")
    g.add_argument("--output", type=str, default="",
                   help="write path<TAB>text lines here instead of stdout")
    g.add_argument("--transcribe_batch", type=int, default=8,
                   help="files per device dispatch")
    ns = vars(p.parse_args(argv))
    opts = {k: ns.pop(k) for k in ("paths", "output", "transcribe_batch")}
    return Config(**ns), opts


def expand_paths(patterns) -> list:
    """Files / recursive directories / globs -> ordered unique file list."""
    out = []
    for pat in patterns:
        if os.path.isdir(pat):
            hits = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(pat) for f in fs
                if f.lower().endswith(AUDIO_EXTS))
        elif os.path.exists(pat):
            if not pat.lower().endswith(AUDIO_EXTS):
                raise ValueError(
                    f"{pat!r} exists but is not a supported audio file "
                    f"(want one of {', '.join(AUDIO_EXTS)})")
            hits = [pat]
        else:
            hits = sorted(h for h in glob.glob(pat, recursive=True)
                          if h.lower().endswith(AUDIO_EXTS))
        if not hits:
            raise FileNotFoundError(f"no audio files match {pat!r}")
        out.extend(hits)
    seen = set()
    return [p for p in out if not (p in seen or seen.add(p))]


def main(argv=None):
    cfg, opts = parse(argv)
    if cfg.use_saved_config:
        cfg, overridden = apply_saved_model_config(cfg, cfg.save_dir)
        for line in overridden:
            log.info("model flag from training snapshot: %s", line)
    paths = expand_paths(opts["paths"])
    log.info("transcribing %d files (beam %s, lm %s)", len(paths),
             cfg.beam_size if cfg.beam_size > 1 else "greedy",
             bool(cfg.apply_lm))
    rec = Recognizer.from_checkpoint(
        cfg.save_dir, cfg, epoch=cfg.restore_epoch,
        lm_dir=cfg.lm_dir if cfg.apply_lm else "")
    texts = rec.transcribe(
        paths, beam_size=cfg.beam_size if cfg.beam_size > 1 else 0,
        batch_size=opts["transcribe_batch"])
    lines = [f"{p}\t{t}" for p, t in zip(paths, texts)]
    if opts["output"]:
        os.makedirs(os.path.dirname(opts["output"]) or ".", exist_ok=True)
        with open(opts["output"], "w") as f:
            f.write("\n".join(lines) + "\n")
        log.info("wrote %d transcripts to %s", len(lines), opts["output"])
    else:
        for line in lines:
            print(line)
    return texts


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
