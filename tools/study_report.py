"""Summarize training runs from a summary dir's events.jsonl.

The A/B studies in benchmarks/WER_SYNTH.md quote, per arm: step count,
final loss, the attention-transition step (first sustained att_peak
crossing), and delivered steps/s.  This tool computes them from the
JSONL scalar stream `utils/summary.py` writes (the TB-equivalent
subsystem; reference logs these ad hoc to stdout, train.py:114-126),
so the quoted numbers are reproducible:

    python tools/study_report.py exp/he/summary [--att_threshold 0.5]

A summary dir that hosted several runs (re-launches append) is split
into runs wherever the step counter restarts; each run is reported
separately as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from statistics import median


def split_runs(events):
    """Split a scalar-event stream into runs at step restarts."""
    runs, cur, last_step = [], [], None
    for e in events:
        step = e["step"]
        if last_step is not None and step < last_step and cur:
            runs.append(cur)
            cur = []
        cur.append(e)
        last_step = step
    if cur:
        runs.append(cur)
    return runs


def first_sustained_crossing(pairs, threshold, patience=3):
    """First step where the value crosses the threshold and stays there
    for `patience` consecutive samples (a single lucky batch does not
    count as the alignment transition)."""
    run = 0
    start = None
    for step, value in pairs:
        if value >= threshold:
            run += 1
            if start is None:
                start = step
            if run >= patience:
                return start
        else:
            run, start = 0, None
    return None


def summarize_run(events, att_threshold):
    by_tag = {}
    for e in events:
        by_tag.setdefault(e["tag"], []).append((e["step"], e["value"]))
    out = {}
    steps = [s for pairs in by_tag.values() for s, _ in pairs]
    out["first_step"], out["last_step"] = min(steps), max(steps)
    loss = by_tag.get("train/loss", [])
    if loss:
        out["final_loss"] = round(median(v for _, v in loss[-5:]), 5)
    att = by_tag.get("train/att_peak", [])
    if att:
        out["att_transition_step"] = first_sustained_crossing(
            att, att_threshold)
        out["final_att_peak"] = round(median(v for _, v in att[-5:]), 4)
    sps = by_tag.get("train/steps_per_sec", [])
    if sps:
        out["median_steps_per_sec"] = round(median(v for _, v in sps), 2)
    return out


def load_events(path):
    if os.path.isdir(path):
        path = os.path.join(path, "events.jsonl")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            e = json.loads(line)
            if e.get("kind") == "scalar":
                yield e


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("summary", nargs="+",
                   help="summary dir(s) or events.jsonl file(s)")
    p.add_argument("--att_threshold", type=float, default=0.5,
                   help="att_peak level that counts as 'transitioned'")
    args = p.parse_args(argv)
    reports = []
    for path in args.summary:
        for i, run in enumerate(split_runs(list(load_events(path)))):
            rep = {"source": path, "run": i}
            rep.update(summarize_run(run, args.att_threshold))
            reports.append(rep)
            print(json.dumps(rep))
    return reports


if __name__ == "__main__":
    main()
