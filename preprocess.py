"""Corpus preprocessing: transcripts -> token ids, audio -> features
(reference driver: preprocess.py:110-202).

TPU-native restructuring: the reference runs speechpy per utterance on the
host CPU (its hot loop, preprocess.py:67-89); here audio is decoded on the
host and featurized by the batched on-device frontend
(ops/frontend.extract_features_list) — the 50x north-star path.  Speed
augmentation is an in-memory resampler (ops/augmentation.py) instead of a
sox subprocess per file.

Output layout mirrors the reference (feat_dir):
  {cat}-feats.npy / {cat}-feats-{i}.npy   object arrays of (T, D, 3) float32
  {cat}-featlen.npy                       int lengths
  {cat}-{unit}s.npy, {cat}-{unit}len.npy  ragged token ids + lengths
(The reference uses joblib pickles for feats; .npy object arrays carry the
same content without the joblib dependency.)
"""

from __future__ import annotations

import glob as globlib
import json
import logging
import os
import sys

import numpy as np


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
from automatic_speech_recognition_tpu.config import parse_args
from automatic_speech_recognition_tpu.data.audio_io import read_audio
from automatic_speech_recognition_tpu.utils.numerics import cdiv
from automatic_speech_recognition_tpu.ops import augmentation
from automatic_speech_recognition_tpu.ops import frontend
from automatic_speech_recognition_tpu.utils.text import strip_punctuation
from automatic_speech_recognition_tpu.utils.tokenizer import get_tokenizer

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("preprocess")


def data_preparation(libri_path):
    """Pair transcript lines with audio files (reference: preprocess.py:26-48).

    Walks <libri_path>/**/**/, reads each chapter's .txt, pairs every line
    with `<utt_id>.flac` (or `.wav`), strips apostrophes.
    """
    folders = sorted(globlib.glob(os.path.join(libri_path, "**", "**")))
    texts, audio_path = [], []
    for path in folders:
        txts = sorted(globlib.glob(os.path.join(path, "*txt")))
        if not txts:
            continue
        with open(txts[0]) as f:
            for line in f.readlines():
                head = line.split(" ")[0]
                base = os.path.join(path, head)
                for ext in (".flac", ".wav"):
                    if os.path.exists(base + ext):
                        cand = base + ext
                        break
                else:
                    # fail here with a clear message instead of deep in a
                    # featurize worker after chunks of completed work
                    raise FileNotFoundError(
                        f"transcript {txts[0]} references {head} but "
                        f"neither {base}.flac nor {base}.wav exists")
                audio_path.append(cand)
                # rstrip, not [:-1]: a final line without '\n' must not
                # lose its last character
                texts.append(
                    line.rstrip("\n")[len(head) + 1:].replace("'", ""))
    return texts, audio_path


def process_texts(texts, tokenizer):
    """Strip punctuation, tokenize, append EOS (reference: preprocess.py:93-107)."""
    tokens, tokenlen = [], []
    for t in texts:
        ids = tokenizer.encode(strip_punctuation(t), with_eos=True)
        tokens.append(np.asarray(ids, np.int32))
        tokenlen.append(len(ids))
    return _object_array(tokens), np.asarray(tokenlen, np.int32)


def _object_array(items):
    arr = np.empty(len(items), dtype=object)
    for i, x in enumerate(items):
        arr[i] = x
    return arr


def load_signals(audio_path, sample_rate, num_workers: int = 8):
    """Decode audio files on the host with a thread pool (the native FLAC
    decoder releases the GIL during ctypes calls, so threads scale)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(p):
        sig, sr = read_audio(p)
        if sr != sample_rate:
            raise ValueError(f"{p}: sample rate {sr} != {sample_rate}")
        return np.asarray(sig, np.float32)

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(one, audio_path))


def process_audios(signals, cfg):
    """Batched on-device featurization; returns (object array, lengths)."""
    feats = frontend.extract_features_list(signals, cfg)
    featlen = np.asarray([len(f) for f in feats], np.int32)
    return _object_array(feats), featlen


def save_feats(cfg, cat, audio_path, transform=None):
    """Shard big sets like the reference (>30k utts, preprocess.py:17,
    :112-125).  Audio is decoded per shard part, so peak host memory is
    bounded by sample_threshold utterances regardless of corpus size
    (the reference likewise featurizes from paths chunk by chunk).
    transform: optional per-signal fn (speed augmentation)."""
    thr = cfg.sample_threshold

    def featurize(paths):
        signals = load_signals(paths, cfg.sample_rate)
        if transform is not None:
            signals = [transform(s) for s in signals]
        if cfg.audio_shards:
            # raw-waveform mode: dump (S, 1, 1) float32 signals under the
            # same {cat}-feats naming contract; the frontend runs inside
            # the jitted train/eval dispatch instead (ops/frontend.py:
            # featurize_batch), so there is no feature stage at all
            sigs = [np.asarray(s, np.float32).reshape(-1, 1, 1)
                    for s in signals]
            return (_object_array(sigs),
                    np.asarray([len(s) for s in sigs], np.int32))
        return process_audios(signals, cfg)

    if len(audio_path) > thr:
        # ceil so no chunk exceeds the threshold (floor could put nearly
        # 2*thr utterances in one chunk and break the memory bound)
        k = cdiv(len(audio_path), thr)
        n = cdiv(len(audio_path), k)
        featlen_all = []
        for i in range(k):
            chunk = audio_path[i * n:(i + 1) * n]
            if not chunk:  # k*n can overshoot len by a few slots
                break
            feats, featlen = featurize(chunk)
            featlen_all.extend(featlen.tolist())
            np.save(os.path.join(cfg.feat_dir, f"{cat}-feats-{i}.npy"),
                    feats, allow_pickle=True)
        featlen = np.asarray(featlen_all, np.int32)
    else:
        feats, featlen = featurize(audio_path)
        np.save(os.path.join(cfg.feat_dir, f"{cat}-feats.npy"),
                feats, allow_pickle=True)
    np.save(os.path.join(cfg.feat_dir, f"{cat}-featlen.npy"), featlen)


def main_libri(cfg, tokenizer):
    path = [("train-100", cfg.train_100hr_corpus_dir),
            ("train-360", cfg.train_360hr_corpus_dir),
            ("train-500", cfg.train_500hr_corpus_dir),
            ("dev", cfg.dev_data_dir),
            ("test", cfg.test_data_dir)]
    os.makedirs(cfg.feat_dir, exist_ok=True)
    for cat, libri_path in path:
        if not os.path.isdir(libri_path):
            log.info("skip %s (no directory %s)", cat, libri_path)
            continue
        texts, audio_path = data_preparation(libri_path)
        log.info("%s: %d utterances", cat, len(texts))
        tokens, tokenlen = process_texts(texts, tokenizer)
        np.save(os.path.join(cfg.feat_dir, f"{cat}-{cfg.unit}s.npy"),
                tokens, allow_pickle=True)
        np.save(os.path.join(cfg.feat_dir, f"{cat}-{cfg.unit}len.npy"),
                tokenlen)
        save_feats(cfg, cat, audio_path)
        if cfg.augmentation and "train" in cat:
            for s in augmentation.SPEED_LIST:
                # per-source-cat names so multiple train sets don't
                # overwrite each other's augmented dumps
                aug_cat = f"speed_{s}_{cat}"
                log.info("speed augmentation x%.1f for %s", s, cat)
                save_feats(cfg, aug_cat, audio_path,
                           transform=lambda sig, sp=s:
                           augmentation.speed_perturb(sig, sp))
                np.save(os.path.join(cfg.feat_dir,
                                     f"{aug_cat}-{cfg.unit}s.npy"),
                        tokens, allow_pickle=True)
                np.save(os.path.join(cfg.feat_dir,
                                     f"{aug_cat}-{cfg.unit}len.npy"),
                        tokenlen)


def main(argv=None):
    cfg = parse_args(argv)
    log.info("parameters:\n%s", cfg.to_json())
    tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
    assert cfg.dataset == "LibriSpeech", cfg.dataset
    main_libri(cfg, tokenizer)


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
