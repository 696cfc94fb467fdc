"""Pack preprocessed features into ARSH shards
(reference driver: create_tfrecord.py:99-152, writing TFRecords).

Reads the preprocess.py output in feat_dir ({cat}-feats[-i].npy object
arrays + {cat}-{unit}s.npy token ids), shuffles training sets, drops
training utterances with featlen >= maxlen (1710, create_tfrecord.py:28,
:136-137), and writes ~records_per_shard-record shards (:29) into shard_dir:

  train-1.arsh ... train-N.arsh      (all available train-{100,360,500} +
                                      speed-augmented sets)
  dev-1.arsh / test-1.arsh           (unshuffled, no length cut)
"""

from __future__ import annotations

import glob as globlib
import logging
import os
import sys

import numpy as np


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
from automatic_speech_recognition_tpu.config import parse_args
from automatic_speech_recognition_tpu.data import shards

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("create_shards")


def load_cat_feats(feat_dir: str, cat: str):
    """Load one category's features: single file or numbered parts."""
    single = os.path.join(feat_dir, f"{cat}-feats.npy")
    if os.path.exists(single):
        return list(np.load(single, allow_pickle=True))
    parts = sorted(globlib.glob(os.path.join(feat_dir, f"{cat}-feats-*.npy")),
                   key=lambda p: int(p.rsplit("-", 1)[1].split(".")[0]))
    feats = []
    for p in parts:
        feats.extend(np.load(p, allow_pickle=True))
    return feats


def main(argv=None):
    cfg = parse_args(argv)
    os.makedirs(cfg.shard_dir, exist_ok=True)

    maxlen = cfg.maxlen
    if cfg.audio_shards:
        # records are raw waveforms: apply the reference's frame-unit
        # MAXLEN cut in sample units (frames >= m <=> samples >= m*fstride
        # + flen), so exactly the same utterances are dropped as in the
        # feature-shard pipeline
        from automatic_speech_recognition_tpu.ops.frontend_host import \
            frame_params
        flen, fstride = frame_params(cfg.sample_rate, cfg.frame_length,
                                     cfg.frame_step)
        maxlen = cfg.maxlen * fstride + flen

    # every train-* and speed_* (augmented, per source cat) feature dump
    cats_on_disk = sorted({
        os.path.basename(p).split("-feats")[0]
        for p in globlib.glob(os.path.join(cfg.feat_dir, "*-feats*"))})
    train_cats = [c for c in cats_on_disk
                  if c.startswith("train-") or c.startswith("speed_")]
    start_index, total = 1, 0
    for cat in train_cats:
        feats = load_cat_feats(cfg.feat_dir, cat)
        tokens = list(np.load(
            os.path.join(cfg.feat_dir, f"{cat}-{cfg.unit}s.npy"),
            allow_pickle=True))
        assert len(feats) == len(tokens), cat
        paths = shards.create_shards(
            feats, tokens, os.path.join(cfg.shard_dir, "train"),
            records_per_shard=cfg.records_per_shard, maxlen=maxlen,
            shuffle=True, seed=cfg.seed, start_index=start_index)
        n = shards.get_num_records(paths)
        log.info("%s: %d records -> %d shards", cat, n, len(paths))
        start_index += len(paths)
        total += n

    for cat in ("dev", "test"):
        if not globlib.glob(os.path.join(cfg.feat_dir, f"{cat}-feats*")):
            continue
        feats = load_cat_feats(cfg.feat_dir, cat)
        tokens = list(np.load(
            os.path.join(cfg.feat_dir, f"{cat}-{cfg.unit}s.npy"),
            allow_pickle=True))
        paths = shards.create_shards(
            feats, tokens, os.path.join(cfg.shard_dir, cat),
            records_per_shard=max(len(feats), 1), maxlen=None, shuffle=False)
        log.info("%s: %d records -> %s", cat, len(feats), paths)

    log.info("total train records: %d", total)


if __name__ == "__main__":
    main()
