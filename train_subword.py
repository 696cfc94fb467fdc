"""Train the subword (CharBPE) tokenizer on the training transcripts
(reference driver: train_subword.py:18-33).

Collects every transcript line from the train corpus dirs into
<subword_dir>/corpus_all.txt, then trains a CharBPE of --size tokens with
specials <PAD> <SOS> <EOS> <unk> (reference: utils/tokenizer.py:26-41),
writing bpe-vocab.json / bpe-merges.txt into --subword_dir.
"""

from __future__ import annotations

import logging
import os
import sys


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
from automatic_speech_recognition_tpu.config import build_parser
from automatic_speech_recognition_tpu.utils.tokenizer import (
    SPECIAL_TOKENS, train_subword_tokenizer)

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("train_subword")


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--size", type=int, default=5000,
                        help="BPE vocab size (reference train_subword.py)")
    args = parser.parse_args(argv)

    from preprocess import data_preparation
    texts = []
    for d in (args.train_100hr_corpus_dir, args.train_360hr_corpus_dir,
              args.train_500hr_corpus_dir):
        if os.path.isdir(d):
            t, _ = data_preparation(d)
            texts.extend(t)
            log.info("%s: %d transcripts", d, len(t))
    if not texts:
        raise FileNotFoundError("no train corpus directories found")

    os.makedirs(args.subword_dir, exist_ok=True)
    corpus = os.path.join(args.subword_dir, "corpus_all.txt")
    with open(corpus, "w") as f:
        f.write("\n".join(texts))
    log.info("corpus written: %s (%d lines)", corpus, len(texts))

    bpe = train_subword_tokenizer(args.size, SPECIAL_TOKENS,
                                  args.subword_dir)
    log.info("BPE trained: vocab %d -> %s", bpe.get_vocab_size(),
             args.subword_dir)


if __name__ == "__main__":
    main()
