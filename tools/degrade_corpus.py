#!/usr/bin/env python3
"""Render an acoustically degraded copy of a LibriSpeech-layout corpus.

Walks `--in_dir` for `*.flac` + `*.trans.txt`, applies reverberation and/or
additive noise per utterance (ops/augmentation.make_degrader — the same
degradation tools/synth_corpus.py applies while synthesizing), and writes
the same tree under `--out_dir`.  Noise draws are seeded per utterance id,
so the output pairs exactly with the input corpus for matched-pair WER
comparisons (tools/wer_ci.py), and re-runs are reproducible.

Works on any corpus in the reference's layout (prepare_libri_data.sh),
including real LibriSpeech — this is the offline robustness-study
counterpart of the on-device training-time `--online_noise_perturb`.
No reference equivalent (its only augmentations are sox speed/volume
re-renders, utils/augmentation.py:6-56).
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automatic_speech_recognition_tpu.data.flac import read_flac  # noqa: E402
from automatic_speech_recognition_tpu.data.flac_encode import (  # noqa: E402
    encode_flac)
from automatic_speech_recognition_tpu.ops.augmentation import (  # noqa: E402
    make_degrader)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True,
                    help="corpus root (LibriSpeech layout)")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--noise_snr", default="",
                    help="'lo,hi' dB per-utterance SNR range (empty = none)")
    ap.add_argument("--noise_kind", default="pink",
                    choices=["white", "pink"])
    ap.add_argument("--reverb_p", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    try:
        degrade = make_degrader(args.noise_snr, args.noise_kind,
                                args.reverb_p)
    except ValueError as e:
        raise SystemExit(f"--noise_snr/--noise_kind: {e}")
    if degrade is None:
        raise SystemExit("nothing to do: pass --noise_snr and/or --reverb_p")
    flacs = sorted(glob.glob(os.path.join(args.in_dir, "**", "*.flac"),
                             recursive=True))
    trans = sorted(glob.glob(os.path.join(args.in_dir, "**", "*.trans.txt"),
                             recursive=True))
    if not flacs:
        raise SystemExit(f"no .flac under {args.in_dir}")

    t0 = time.time()
    # sample_rate -> degrade fn (the reverb IR scales with fs); seeded
    # with the validated 16 kHz instance built above
    degraders = {16000: degrade}
    for i, src in enumerate(flacs):
        rel = os.path.relpath(src, args.in_dir)
        dst = os.path.join(args.out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        sig, rate = read_flac(src)
        if rate not in degraders:
            degraders[rate] = make_degrader(args.noise_snr, args.noise_kind,
                                            args.reverb_p, sample_rate=rate)
        uid = os.path.splitext(os.path.basename(src))[0]
        rng = np.random.default_rng([args.seed, zlib.crc32(uid.encode())])
        out = degraders[rate](sig, rng)
        pcm = np.clip(np.round(out * 32767.0), -32768, 32767).astype(np.int32)
        with open(dst, "wb") as f:
            f.write(encode_flac([pcm], sample_rate=rate, blocksize=4096,
                                subframe_kind="verbatim"))
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{len(flacs)} "
                  f"({(i + 1) / (time.time() - t0):.1f}/s)", flush=True)
    for src in trans:
        rel = os.path.relpath(src, args.in_dir)
        dst = os.path.join(args.out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
    print(f"degraded {len(flacs)} utterances, copied {len(trans)} "
          f"transcripts -> {args.out_dir}")


if __name__ == "__main__":
    main()
