"""Harvest round-4 study-stage results from logs_r4/ into markdown.

The chain (tools/round4_post_base.sh) writes one log per stage;
logs_r4/ is gitignored, so the numbers must be copied into a committed
artifact as they land.  This extracts each stage's final WER/CER lines
plus run state and rewrites benchmarks/ROUND4_RESULTS.md — run it after
any stage completes, commit the result.  No reference counterpart
(study tooling).
"""

import glob
import os
import re
import sys
import time

LOGS = "logs_r4"
OUT = "benchmarks/ROUND4_RESULTS.md"

# chain stage -> short description, in chain order
STAGES = [
    ("base_greedy_dev", "base: greedy (dev)"),
    ("base_attbeam_dev", "base: ATT-ONLY beam-8 (dev) — published decode mode"),
    ("base_jointbeam_dev", "base: joint-CTC beam-8 (dev)"),
    ("avg", "checkpoint averaging (build)"),
    ("avg_eval", "avg: greedy / att-beam / joint-beam (dev)"),
    ("lmsweep", "LM fusion x joint-CTC beam-8, lambda sweep (dev)"),
    ("base_greedy_test", "base: greedy (test)"),
    ("base_attbeam_test", "base: ATT-ONLY beam-8 (test) — published decode mode"),
    ("base_jointbeam_test", "base: joint-CTC beam-8 (test)"),
    ("rescue_aug", "rescue arm: online noise+speed fine-tune"),
    ("rescue_aug_eval", "rescue aug: decodes"),
    ("rescue_ss2", "rescue arm: gentle scheduled sampling"),
    ("rescue_ss2_eval", "rescue ss2: decodes"),
    ("pblstm_train", "pBLSTM arm: train"),
    ("pblstm_eval", "pBLSTM arm: greedy trajectory (dev)"),
    ("rescue_do", "rescue arm: decoder dropout"),
    ("rescue_do_eval", "rescue do: decodes"),
    ("lmtest", "LM fusion best-lambda (test)"),
    # round-5 chain (tools/round5_chain.sh)
    ("base_attbeam_redump", "base att-beam re-dump for error analysis"),
    ("attbeam_error_analysis", "error decomposition: base + arms"),
    ("base_ctcgreedy", "encoder-health probe: CTC-greedy (dev)"),
    ("basin_k50", "dead-basin replication: K=50 flagship, monitor armed"),
    ("bench_recapture", "fresh bench capture on quiet chip"),
    ("rescue_ss3", "rescue arm: full-ramp scheduled sampling (tf->0.4)"),
    ("rescue_ss3_eval", "rescue ss3: decodes"),
    ("basin_k50_seed1", "dead-basin probe #2: K=50, seed 1 (15k)"),
    ("basin_k50_seed1_ext", "seed-1 extension to 40k: bind-then-collapse"),
    ("pblstm_final", "pBLSTM: greedy (test)"),
    ("pblstm_beam", "pBLSTM: joint-CTC beam-8 (dev/test)"),
    ("pblstm_attbeam_dev", "pBLSTM: ATT-ONLY beam-8 (dev) — published mode WORKS"),
    ("pblstm_attbeam_test", "pBLSTM: ATT-ONLY beam-8 (test)"),
    ("covprobe", "decode-time coverage scoring sweep on att-only beam"),
    ("dec512_train", "capacity probe: dec 512x2 flagship schedule (seed 0)"),
    ("dec512_eval", "capacity probe evals (seed 0)"),
    ("dec512s1_train", "capacity probe (seed 1)"),
    ("dec512s1_eval", "capacity probe evals (seed 1)"),
    ("dec256_train", "capacity probe: dec 256x2, flagship enc+schedule"),
    ("dec256_eval", "capacity probe evals (dec 256x2)"),
    ("monitor_abort_probe", "live exit-20 validation: alarm->ckpt->abort at 10k"),
    ("base_resume_e40", "flagship resumed e25->e40 (100k steps, recycles live)"),
    ("e40_anchors", "e40 anchors: joint 0.0076 / att 0.5387 / greedy 0.5550"),
]

def stage_summary(path: str) -> str:
    try:
        text = open(path, errors="replace").read()
    except OSError:
        return "(no log)"
    lines = []
    for m in re.finditer(
            r"^(=== .+ ===|WER: .+|CER: .+|\{\"metric\".*"
            r"|.*training-health monitor.*|.*restor\w+ .*epoch.*)$",
            text, re.M):
        s = m.group(0).strip()
        if len(s) < 200 and ("===" in s or s[:4] in ("WER:", "CER:")
                             or "restor" in s or "monitor" in s
                             or s.startswith('{"metric"')):
            lines.append(s)
    if not lines:
        tail = text.strip().splitlines()
        return "(running / no WER yet) last: " + (tail[-1][:110] if tail else "")
    return "; ".join(lines[-14:])


def main():
    rows = []
    for name, desc in STAGES:
        p = os.path.join(LOGS, f"{name}.log")
        if not os.path.exists(p):
            continue
        rows.append((name, desc, stage_summary(p)))
    extra = []
    for p in ("base_train.log", "lm_train.log", "post_base.log"):
        fp = os.path.join(LOGS, p)
        if os.path.exists(fp):
            tail = open(fp, errors="replace").read().strip().splitlines()
            extra.append((p, tail[-1][:140] if tail else ""))

    with open(OUT, "w") as f:
        f.write("# Round-4/5 study results (auto-harvested)\n\n"
                "The round-4 post-base chain plus every round-5 stage "
                "(rescue arms, probes,\nbasin replications, bench "
                "recaptures) — one file, chain order.\n\n")
        f.write(f"Harvested {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} "
                f"from `logs_r4/` by `tools/harvest_round4.py`.\n"
                "Narrative interpretation lives in `benchmarks/WER_SYNTH.md`.\n\n")
        if extra:
            f.write("## Run state\n\n")
            for name, tail in extra:
                f.write(f"- `{name}`: {tail}\n")
            f.write("\n")
        if rows:
            f.write("## Stage results\n\n")
            for name, desc, summ in rows:
                f.write(f"### {name} — {desc}\n\n{summ}\n\n")
        else:
            f.write("No chain stages have started yet.\n")
    print(f"wrote {OUT} ({len(rows)} stages)")


if __name__ == "__main__":
    sys.exit(main())
