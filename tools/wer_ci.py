"""Bootstrap confidence intervals and paired significance for WER/CER.

The reference repo reports point WERs only (reference test.py:127-136);
its README's 0.249-vs-0.262 comparisons carry no uncertainty.  Our
synthesized-speech studies showed why that is dangerous: transition
timing is seed-chaotic and seed variance dominates sub-3%-absolute A/Bs
(benchmarks/WER_SYNTH.md).  This tool quantifies both:

  # one system: corpus WER with a 95% bootstrap CI
  python tools/wer_ci.py --ref log/test_gt.txt --hyp log/test_pred.txt

  # paired A/B on the same eval set: dWER CI + sign-flip p-value
  python tools/wer_ci.py --ref gt.txt --hyp a_pred.txt --hyp2 b_pred.txt

Method (Bisani & Ney 2004, "Bootstrap estimates for confidence
intervals in ASR performance evaluation"): resample utterances with
replacement B times; corpus WER of a resample is sum(edits)/sum(ref
lens) over the drawn indices, so per-utterance (edit, len) pairs are
computed once and each resample is two vector sums.  The paired test
resamples the SAME indices for both systems — utterance difficulty
cancels, which is what makes the A/B comparison sharp even when the
individual CIs overlap.  p is the two-sided bootstrap sign-flip rate
of dWER = WER(hyp2) - WER(hyp).

Line format: one utterance per line, hyp and ref files line-aligned —
exactly what test.py/decode.py write to {test,decode}_{pred,gt}.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automatic_speech_recognition_tpu.utils.text import edit_distance


def read_lines(path: str) -> list:
    with open(path) as f:
        return [line.rstrip("\n") for line in f]


def per_utt_stats(refs, hyps, cer: bool) -> np.ndarray:
    """(N, 2) array of [edit distance, reference length] per utterance."""
    tok = (lambda s: list(s)) if cer else (lambda s: s.split(" "))
    out = np.empty((len(refs), 2), np.float64)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        out[i] = edit_distance(tok(r), tok(h))
    return out


def bootstrap(stats: np.ndarray, n_boot: int, seed: int) -> np.ndarray:
    """n_boot corpus error rates from utterance resamples."""
    rng = np.random.default_rng(seed)
    n = stats.shape[0]
    idx = rng.integers(0, n, size=(n_boot, n))
    drawn = stats[idx]                        # (B, N, 2)
    return drawn[:, :, 0].sum(1) / np.maximum(drawn[:, :, 1].sum(1), 1.0)


def paired_bootstrap(stats_a: np.ndarray, stats_b: np.ndarray,
                     n_boot: int, seed: int):
    """(delta samples, wer_a samples, wer_b samples) on shared resamples."""
    rng = np.random.default_rng(seed)
    n = stats_a.shape[0]
    idx = rng.integers(0, n, size=(n_boot, n))
    drawn_a = stats_a[idx]  # bind once: the gather is the big temporary
    wa = drawn_a[:, :, 0].sum(1) / np.maximum(drawn_a[:, :, 1].sum(1), 1.0)
    del drawn_a
    drawn_b = stats_b[idx]
    wb = drawn_b[:, :, 0].sum(1) / np.maximum(drawn_b[:, :, 1].sum(1), 1.0)
    return wb - wa, wa, wb


def ci(samples: np.ndarray, level: float):
    lo, hi = np.percentile(samples, [(100 - level) / 2,
                                     100 - (100 - level) / 2])
    return float(lo), float(hi)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ref", required=True, help="reference transcripts")
    p.add_argument("--hyp", required=True, help="system A hypotheses")
    p.add_argument("--hyp2", default="", help="system B for a paired test")
    p.add_argument("--cer", action="store_true",
                   help="character instead of word error rate")
    p.add_argument("--n_boot", type=int, default=10000)
    p.add_argument("--level", type=float, default=95.0,
                   help="confidence level in percent")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true",
                   help="machine-readable one-line output")
    a = p.parse_args(argv)

    refs, hyps = read_lines(a.ref), read_lines(a.hyp)
    if len(refs) != len(hyps):
        raise ValueError(f"--ref has {len(refs)} lines, --hyp {len(hyps)}; "
                         "files must be line-aligned")
    if not refs:
        raise ValueError("empty reference file")
    metric = "CER" if a.cer else "WER"
    stats_a = per_utt_stats(refs, hyps, a.cer)
    point_a = stats_a[:, 0].sum() / max(stats_a[:, 1].sum(), 1.0)
    result = {"metric": metric, "n_utts": len(refs), "n_boot": a.n_boot,
              "level": a.level, "wer_a": point_a}

    if a.hyp2:
        hyps_b = read_lines(a.hyp2)
        if len(hyps_b) != len(refs):
            raise ValueError(f"--hyp2 has {len(hyps_b)} lines, expected "
                             f"{len(refs)}")
        stats_b = per_utt_stats(refs, hyps_b, a.cer)
        point_b = stats_b[:, 0].sum() / max(stats_b[:, 1].sum(), 1.0)
        delta, wa, wb = paired_bootstrap(stats_a, stats_b, a.n_boot, a.seed)
        dlo, dhi = ci(delta, a.level)
        point_d = point_b - point_a
        # two-sided sign-flip rate; the +1 guards make p honest at the
        # resolution the bootstrap actually has (never exactly 0)
        flips = min((delta >= 0).sum(), (delta <= 0).sum())
        pval = min(1.0, 2.0 * (flips + 1) / (a.n_boot + 1))
        result.update(wer_b=point_b, delta=point_d, delta_ci=[dlo, dhi],
                      p_value=pval,
                      significant=bool(dlo > 0 or dhi < 0))
        if a.json:
            print(json.dumps(result))
        else:
            alo, ahi = ci(wa, a.level)
            blo, bhi = ci(wb, a.level)
            print(f"{metric} A: {point_a:.4f}  [{alo:.4f}, {ahi:.4f}] "
                  f"{a.level:.0f}% CI  ({a.hyp})")
            print(f"{metric} B: {point_b:.4f}  [{blo:.4f}, {bhi:.4f}] "
                  f"{a.level:.0f}% CI  ({a.hyp2})")
            print(f"delta (B-A): {point_d:+.4f}  [{dlo:+.4f}, {dhi:+.4f}], "
                  f"p = {pval:.4f} "
                  f"({'significant' if result['significant'] else 'NOT significant'} "
                  f"at {a.level:.0f}%)")
    else:
        samples = bootstrap(stats_a, a.n_boot, a.seed)
        lo, hi = ci(samples, a.level)
        result.update(ci=[lo, hi])
        if a.json:
            print(json.dumps(result))
        else:
            print(f"{metric}: {point_a:.4f}  [{lo:.4f}, {hi:.4f}] "
                  f"{a.level:.0f}% CI over {len(refs)} utts "
                  f"({a.n_boot} resamples)")
    return result


if __name__ == "__main__":
    main()
