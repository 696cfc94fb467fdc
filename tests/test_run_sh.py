"""run.sh end-to-end: the ORCHESTRATION FILE itself, driven stagewise
against a synthesized fixture corpus (reference: run.sh:29-93).

Every stage CLI is covered by its own tests; this drives `bash run.sh`
— the published-recipe chain train_subword -> preprocess ->
create_shards -> train -> test -> train_lm -> decode — at fixture scale
via the RUN_* environment overrides (model dims, epochs, corpus dirs),
asserting each stage leaves its artifact.  The hyperparameter DEFAULTS
in run.sh stay the published recipe; only scale knobs are overridden.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env=None, timeout=900):
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    e["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    e.update(env or {})
    r = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    assert r.returncode == 0, f"{' '.join(cmd)} failed:\n{r.stdout[-4000:]}"
    return r.stdout


@pytest.mark.slow
def test_run_sh_default_chain(tmp_path):
    raw = tmp_path / "raw"
    _run([sys.executable, "tools/synth_corpus.py", "--out", str(raw),
          "--train_utts", "8", "--dev_utts", "2", "--test_utts", "2",
          "--train_speakers", "2", "--eval_speakers", "2"])

    work = tmp_path / "work"
    env = {
        "RUN_WORKDIR": str(work),
        "RUN_BPE_SIZE": "80",
        "RUN_FEAT_DIM": "8",
        "RUN_ENC_UNITS": "16", "RUN_DEC_UNITS": "16",
        "RUN_EMBEDDING_SIZE": "8", "RUN_ATTENTION_SIZE": "8",
        "RUN_NUM_ENC_LAYERS": "1", "RUN_NUM_DEC_LAYERS": "1",
        "RUN_LR": "1e-3", "RUN_EPOCH": "1", "RUN_BEAM_SIZE": "4",
        "RUN_CONVERT_RATE": "0.3", "RUN_LM_EPOCHS": "1",
        # 8 fixture utterances leave < 201 chars in the 5% valid split;
        # shrink the LM batch geometry to match the corpus
        "RUN_LM_FLAGS": "--batch_size 2 --num_unrollings 10 "
                        "--train_frac 0.6 --valid_frac 0.2",
        "RUN_EXTRA_FLAGS": " ".join([
            "--train_100hr_corpus_dir", str(raw / "train"),
            "--dev_data_dir", str(raw / "dev"),
            "--test_data_dir", str(raw / "test"),
            "--num_enc_channels 4 --steps_per_epoch 20",
            "--bucket_batch_sizes 2,2,2,2,2,2,2,2,2",
            "--stall_timeout_s 0",
        ]),
    }

    stages = {
        "subword": ["subword/bpe-vocab.json", "subword/bpe-merges.txt",
                    "subword/corpus_all.txt"],
        "preprocess": ["data/LibriSpeech/features/dev-featlen.npy"],
        "shards": ["data/shards"],
        "train": ["model/las/config.json"],
        "test": ["log/test_pred.txt", "log/test_gt.txt"],
        "lm": ["lang/output/result.json"],
        "decode": ["log/decode_pred.txt"],
    }
    for stage, artifacts in stages.items():
        out = _run(["bash", "run.sh", stage], env=env)
        for a in artifacts:
            p = work / a
            assert p.exists(), (
                f"stage {stage} left no {a}; output:\n{out[-2000:]}")
    # the chain's correctness oracles actually printed a number
    assert "WER:" in _run(["bash", "run.sh", "test"], env=env)
