"""Checkpoint averaging: uniform parameter average of K epoch checkpoints.

No reference equivalent (the reference evaluates single `las_E{epoch}`
saves, test.py:81-86); weight averaging over the last few epochs is a
standard production-ASR trick that smooths SGD noise and typically buys a
small WER improvement for free at inference time.

Usage:
  python tools/average_checkpoints.py <model flags> \
      --save_dir exp/model --avg_epochs 56,60,64 --avg_out exp/model_avg

Writes the averaged TrainState as epoch 1 under --avg_out, so every
consumer (`test.py --restore_epoch 1`, `decode.py`, `serve.py`,
`api.Recognizer`) loads it unchanged.  Params and BN statistics are
averaged; optimizer state / step / rng are taken from the newest source
epoch (they are not meaningful to average and are unused at inference).
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()
import jax
import numpy as np

from automatic_speech_recognition_tpu.config import Config, build_parser
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager
from automatic_speech_recognition_tpu.utils.tokenizer import get_tokenizer

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("average_checkpoints")


def average_trees(trees):
    """Uniform elementwise mean over a list of matching pytrees (float32
    accumulation regardless of leaf dtype)."""
    def mean(*leaves):
        acc = np.mean([np.asarray(l, np.float32) for l in leaves], axis=0)
        return acc.astype(np.asarray(leaves[0]).dtype)
    return jax.tree_util.tree_map(mean, *trees)


def average_checkpoints(cfg: Config, epochs, out_dir: str):
    tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
    cfg = cfg.replace(vocab_size=tokenizer.get_vocab_size())
    template = trainer.create_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    src = CheckpointManager(cfg.save_dir)
    if not epochs:
        epochs = sorted(src.all_epochs())[-5:]
        if not epochs:
            raise FileNotFoundError(
                f"no checkpoints found in {cfg.save_dir}; nothing to average")
        log.info("no --avg_epochs given; using the last %d: %s",
                 len(epochs), epochs)
    states = []
    for e in sorted(epochs):
        st = src.restore_for_eval(template, epoch=e)
        if st is None:
            raise FileNotFoundError(f"epoch {e} not found in {cfg.save_dir} "
                                    f"(have {src.all_epochs()})")
        states.append(jax.device_get(st))
    newest = states[-1]
    avg = newest._replace(
        params=average_trees([s.params for s in states]),
        bn_state=average_trees([s.bn_state for s in states]))
    out = CheckpointManager(out_dir)
    out.save(1, avg)
    out.close()
    log.info("averaged %d checkpoints %s -> %s (epoch 1)",
             len(states), sorted(epochs), out_dir)
    return avg


def main(argv=None):
    p = build_parser()
    p.add_argument("--avg_epochs", type=str, default="",
                   help="comma-separated source epochs (default: last 5)")
    p.add_argument("--avg_out", type=str, required=True,
                   help="output checkpoint directory (written as epoch 1)")
    ns = vars(p.parse_args(argv))
    epochs = [int(e) for e in ns.pop("avg_epochs").split(",") if e]
    out_dir = ns.pop("avg_out")
    average_checkpoints(Config(**ns), epochs, out_dir)


if __name__ == "__main__":
    main()
