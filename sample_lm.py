"""Sample text from, or compute perplexity with, a trained char RNNLM
(reference driver: lang/sample.py:13-111).

Loads result.json + vocab.json from --init_dir (written by train_lm.py),
restores the best (or a specific) checkpoint, then either samples
--length characters seeded by --start_text, or evaluates the perplexity
of --example_text.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import logging

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax

from automatic_speech_recognition_tpu.models import char_rnn
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("sample_lm")


def load_lm(init_dir: str, epoch: int = -1):
    """Load (params, cfg, v2i, i2v) from a train_lm.py output directory."""
    with open(os.path.join(init_dir, "result.json")) as f:
        result = json.load(f)
    cfg = char_rnn.LMConfig(**{k: v for k, v in result["params"].items()
                               if k in char_rnn.LMConfig.__dataclass_fields__})
    with open(os.path.join(init_dir, "vocab.json")) as f:
        v2i = json.load(f)
    i2v = {int(i): c for c, i in v2i.items()}
    ts = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), cfg)
    ckpt = CheckpointManager(os.path.join(init_dir, "lang", "best_model"))
    use_epoch = epoch if epoch >= 0 else result.get("best_model", -1)
    restored = ckpt.restore(ts,
                            epoch=use_epoch if use_epoch is not None else -1)
    if restored is None:
        restored = ckpt.restore(ts, epoch=-1)
    if restored is None:
        raise FileNotFoundError(f"no LM checkpoint in {init_dir}")
    return restored.params, cfg, v2i, i2v


def main(argv=None):
    p = argparse.ArgumentParser("char RNNLM sampler/evaluator")
    p.add_argument("--init_dir", type=str, default="lang/output")
    p.add_argument("--model_epoch", type=int, default=-1)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--max_prob", action="store_true", default=True)
    p.add_argument("--no_max_prob", dest="max_prob", action="store_false")
    p.add_argument("--start_text", type=str, default="THE MEANING OF LIFE IS ")
    p.add_argument("--length", type=int, default=100)
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--example_text", type=str,
                   default="THE MEANING OF LIFE IS GOOD.")
    args = p.parse_args(argv)

    params, cfg, v2i, i2v = load_lm(args.init_dir, args.model_epoch)

    if args.evaluate:
        ids = np.asarray([v2i[c] for c in args.example_text if c in v2i],
                         np.int32)
        state = char_rnn.zero_state(cfg, 1)
        loss, _ = char_rnn.lm_eval_loss(params, ids[None, :-1],
                                        ids[None, 1:], state, cfg)
        ppl = float(np.exp(loss))
        print(f"Example text is: {args.example_text}")
        print(f"Perplexity is: {ppl}")
        return ppl

    start_ids = [v2i[c] for c in args.start_text if c in v2i]
    rng = jax.random.PRNGKey(args.seed if args.seed >= 0 else 0)
    out = char_rnn.sample_seq(params, cfg, args.length, start_ids, rng=rng,
                              temperature=args.temperature,
                              max_prob=args.max_prob)
    sample = args.start_text + "".join(i2v[i] for i in out)
    print(f"Sampled text is:\n{sample}")
    return sample


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
