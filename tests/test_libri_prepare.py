"""LibriSpeech day-one dress rehearsal (offline, reference:
prepare_libri_data.sh:1-38).

A tiny synthesized corpus is packed into tarballs with the EXACT openslr
LibriSpeech layout (top-level `LibriSpeech/` dir containing
`train-clean-100`/`dev-clean`/`test-clean`), then the real
`prepare_libri_data.sh` runs against them via its offline knobs
(LIBRI_SOURCE / LIBRI_DATA_ROOT) and the full CLI chain follows:
prepare -> preprocess -> shards -> 50 train steps.  After this test, the
only untested link in the real-data chain is the download URL itself.
"""

import os
import shutil
import subprocess
import sys
import tarfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, env=None, cwd=REPO, timeout=900):
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    # day-one single-host flow: don't inherit the 8-device virtual mesh
    # the in-process suite runs under (conftest.py)
    e["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    e.update(env or {})
    r = subprocess.run(cmd, cwd=cwd, env=e, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    assert r.returncode == 0, f"{' '.join(cmd)} failed:\n{r.stdout[-4000:]}"
    return r.stdout


def _pack(src_dir, inner_name, out_tar, tmp):
    """Pack src_dir as LibriSpeech/<inner_name>/... (openslr layout)."""
    stage = os.path.join(tmp, "stage_" + inner_name)
    dest = os.path.join(stage, "LibriSpeech", inner_name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copytree(src_dir, dest)
    with tarfile.open(out_tar, "w:gz") as tf:
        tf.add(os.path.join(stage, "LibriSpeech"), arcname="LibriSpeech")
    shutil.rmtree(stage)


@pytest.mark.slow
def test_libri_dress_rehearsal(tmp_path):
    # 1. tiny synthesized corpus (openslr speaker/chapter layout + flac)
    raw = tmp_path / "raw"
    _run([sys.executable, "tools/synth_corpus.py", "--out", str(raw),
          "--train_utts", "8", "--dev_utts", "2", "--test_utts", "2",
          "--train_speakers", "2", "--eval_speakers", "2"])

    # 2. tarballs named and shaped exactly like openslr.org/resources/12
    src = tmp_path / "src"
    src.mkdir()
    _pack(str(raw / "train"), "train-clean-100",
          str(src / "train-clean-100.tar.gz"), str(tmp_path))
    _pack(str(raw / "dev"), "dev-clean",
          str(src / "dev-clean.tar.gz"), str(tmp_path))
    _pack(str(raw / "test"), "test-clean",
          str(src / "test-clean.tar.gz"), str(tmp_path))

    # 3. the real prepare script, offline
    data_root = tmp_path / "data"
    _run(["bash", "prepare_libri_data.sh", "100"],
         env={"LIBRI_SOURCE": str(src), "LIBRI_DATA_ROOT": str(data_root)})
    train_dir = data_root / "100" / "LibriSpeech_train" / "train-clean-100"
    dev_dir = data_root / "eval" / "LibriSpeech_dev" / "dev-clean"
    test_dir = data_root / "eval" / "LibriSpeech_test" / "test-clean"
    for d in (train_dir, dev_dir, test_dir):
        assert d.is_dir(), f"prepare did not produce {d}"
    # idempotence: a second run must skip, not re-extract
    out2 = _run(["bash", "prepare_libri_data.sh", "100"],
                env={"LIBRI_SOURCE": str(src),
                     "LIBRI_DATA_ROOT": str(data_root)})
    assert "exists, skipping" in out2

    # 4. preprocess -> shards -> 50 train steps through the real CLIs
    work = tmp_path / "work"
    common = ["--unit", "char", "--feat_type", "mfcc", "--feat_dim", "8",
              "--cmvn", "True",
              "--train_100hr_corpus_dir", str(train_dir),
              "--dev_data_dir", str(dev_dir),
              "--test_data_dir", str(test_dir),
              "--feat_dir", str(work / "features"),
              "--shard_dir", str(work / "shards"),
              "--save_dir", str(work / "model"),
              "--log_dir", str(work / "log"),
              "--summary_dir", str(work / "summary")]
    _run([sys.executable, "preprocess.py"] + common)
    _run([sys.executable, "create_shards.py"] + common)
    out = _run([sys.executable, "train.py"] + common + [
        "--enc_type", "cnn", "--enc_units", "16", "--num_enc_channels", "4",
        "--num_enc_layers", "1", "--dec_units", "16",
        "--num_dec_layers", "1", "--embedding_size", "8",
        "--attention_size", "8", "--mode", "add",
        "--dropout_rate", "0.0", "--scheduled_sampling", "False",
        "--epoch", "1", "--steps_per_epoch", "50",
        "--bucket_batch_sizes", "2,2,2,2,2,2,2,2,2"])
    assert "epoch 1" in out or "step" in out.lower()
    # a checkpoint must exist so day-one training is resumable
    assert (work / "model").is_dir() and any((work / "model").iterdir())
