"""Alignment-based ASR error analysis: what is the system getting wrong?

The reference reports a single corpus WER (reference test.py:127-136)
and leaves the reading of pred/gt dumps to the human.  This tool aligns
each hypothesis to its reference (Levenshtein backtrace, sub=del=ins=1
matching utils/text.py:edit_distance) and aggregates:

  python tools/error_analysis.py --ref log/test_gt.txt --hyp log/test_pred.txt
  python tools/error_analysis.py ... --cer          # character level
  python tools/error_analysis.py ... --examples 5   # worst utterances
  python tools/error_analysis.py ... --json         # machine-readable

Reports the S/D/I error decomposition, the most frequent substitution
pairs / deleted / inserted tokens, and (optionally) the worst-WER
utterances with their alignments — the artifacts one actually needs to
tell an acoustic failure (systematic confusions between similar words)
from a language-model failure (fluent insertions) from an alignment
failure (long deletion runs at utterance ends; see the beam
failure-mode study in benchmarks/WER_SYNTH.md).
"""

from __future__ import annotations

import argparse
import collections
import json

import numpy as np


def align(ref: list, hyp: list):
    """Levenshtein alignment; returns ops list of (kind, ref_tok, hyp_tok)
    with kind in {ok, sub, del, ins}, matching edit_distance's costs."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]))
    ops = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] \
                and ref[i - 1] == hyp[j - 1]:
            ops.append(("ok", ref[i - 1], hyp[j - 1])); i -= 1; j -= 1
        elif i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + 1:
            ops.append(("sub", ref[i - 1], hyp[j - 1])); i -= 1; j -= 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            ops.append(("del", ref[i - 1], None)); i -= 1
        else:
            ops.append(("ins", None, hyp[j - 1])); j -= 1
    return ops[::-1]


def analyze(refs, hyps, cer=False):
    tok = (lambda s: list(s)) if cer else (lambda s: s.split(" "))
    subs = collections.Counter()
    dels = collections.Counter()
    inss = collections.Counter()
    n_ok = n_sub = n_del = n_ins = n_ref = 0
    per_utt = []
    for k, (r, h) in enumerate(zip(refs, hyps)):
        rt, ht = tok(r), tok(h)
        ops = align(rt, ht)
        errs = 0
        for kind, a, b in ops:
            if kind == "ok":
                n_ok += 1
            elif kind == "sub":
                n_sub += 1; subs[(a, b)] += 1; errs += 1
            elif kind == "del":
                n_del += 1; dels[a] += 1; errs += 1
            else:
                n_ins += 1; inss[b] += 1; errs += 1
        n_ref += len(rt)
        per_utt.append((errs / max(len(rt), 1), k, ops))
    return {
        "n_utts": len(per_utt), "n_ref_tokens": n_ref,
        "wer": (n_sub + n_del + n_ins) / max(n_ref, 1),
        "sub_rate": n_sub / max(n_ref, 1),
        "del_rate": n_del / max(n_ref, 1),
        "ins_rate": n_ins / max(n_ref, 1),
        "top_substitutions": subs.most_common(20),
        "top_deletions": dels.most_common(20),
        "top_insertions": inss.most_common(20),
        "_per_utt": sorted(per_utt, reverse=True),
    }


def render_alignment(ops) -> str:
    ref_row, hyp_row = [], []
    for kind, a, b in ops:
        a = a if a is not None else "*"
        b = b if b is not None else "*"
        w = max(len(a), len(b))
        mark = {"ok": " ", "sub": "!", "del": "-", "ins": "+"}[kind]
        ref_row.append((a + mark if kind != "ok" else a).ljust(w + 1))
        hyp_row.append((b + mark if kind != "ok" else b).ljust(w + 1))
    return "REF | " + "".join(ref_row) + "\nHYP | " + "".join(hyp_row)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ref", required=True)
    p.add_argument("--hyp", required=True)
    p.add_argument("--cer", action="store_true")
    p.add_argument("--top", type=int, default=10,
                   help="rows per confusion table")
    p.add_argument("--examples", type=int, default=0,
                   help="print the N worst utterance alignments")
    p.add_argument("--json", action="store_true")
    a = p.parse_args(argv)

    refs = [l.rstrip("\n") for l in open(a.ref)]
    hyps = [l.rstrip("\n") for l in open(a.hyp)]
    if len(refs) != len(hyps):
        raise ValueError(f"--ref has {len(refs)} lines, --hyp {len(hyps)}; "
                         "files must be line-aligned")
    rep = analyze(refs, hyps, cer=a.cer)
    per_utt = rep.pop("_per_utt")
    if a.json:
        rep["top_substitutions"] = [
            [f"{x} -> {y}", c] for (x, y), c in rep["top_substitutions"]]
        print(json.dumps(rep))
    else:
        unit = "CER" if a.cer else "WER"
        print(f"{unit} {rep['wer']:.4f} over {rep['n_utts']} utts "
              f"({rep['n_ref_tokens']} ref tokens): "
              f"sub {rep['sub_rate']:.4f}  del {rep['del_rate']:.4f}  "
              f"ins {rep['ins_rate']:.4f}")
        for name, key in (("substitutions (ref -> hyp)", "top_substitutions"),
                          ("deletions", "top_deletions"),
                          ("insertions", "top_insertions")):
            rows = rep[key][:a.top]
            if not rows:
                continue
            print(f"\ntop {name}:")
            for item, c in rows:
                label = f"{item[0]} -> {item[1]}" if isinstance(item, tuple) \
                    else item
                print(f"  {c:5d}  {label}")
        for rate, k, ops in per_utt[:a.examples]:
            print(f"\nutt {k}  ({'CER' if a.cer else 'WER'} {rate:.2f})")
            print(render_alignment(ops))
    return rep


if __name__ == "__main__":
    main()
