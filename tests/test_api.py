"""High-level Recognizer API: checkpoint -> transcribe files (greedy and
beam), order preservation across length-sorted batching."""

import os

import jax
import numpy as np

from automatic_speech_recognition_tpu.api import Recognizer
from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.data.audio_io import write_wav
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager

CFG = Config(unit="char", feat_dim=13, enc_type="cnn", enc_units=16,
             num_enc_channels=4, num_enc_layers=1, dec_units=16,
             num_dec_layers=1, embedding_size=8, attention_size=8,
             mode="add", dropout_rate=0.0, scheduled_sampling=False,
             convert_rate=0.05)


def test_recognizer_transcribe(tmp_path, rng):
    cfg = CFG.replace(vocab_size=30)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    CheckpointManager(str(tmp_path / "model")).save(1, jax.device_get(ts))

    paths = []
    for i, sec in enumerate((0.4, 1.1, 0.7)):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, rng.standard_normal(int(16000 * sec)) * 0.1, 16000)
        paths.append(p)

    rec = Recognizer.from_checkpoint(str(tmp_path / "model"), CFG)
    greedy = rec.transcribe(paths, beam_size=0, batch_size=2)
    assert len(greedy) == 3 and all(isinstance(t, str) for t in greedy)
    beam = rec.transcribe(paths, beam_size=3, batch_size=2)
    assert len(beam) == 3 and all(isinstance(t, str) for t in beam)

    # order preservation: per-file results identical regardless of batching
    singles = [rec.transcribe([p], beam_size=3)[0] for p in paths]
    assert beam == singles


def test_recognizer_mesh_matches_single_device(tmp_path, rng):
    """Serving over the 8-device ('data','model') mesh returns exactly the
    single-device transcripts, greedy and beam, including request batches
    that do not divide the data axis (padding rows sliced off)."""
    cfg = CFG.replace(vocab_size=30)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    CheckpointManager(str(tmp_path / "model")).save(1, jax.device_get(ts))

    paths = []
    for i, sec in enumerate((0.4, 0.9, 0.6)):  # 3 files: 3 % 8 != 0
        p = str(tmp_path / f"m{i}.wav")
        write_wav(p, rng.standard_normal(int(16000 * sec)) * 0.1, 16000)
        paths.append(p)

    meshed = Recognizer.from_checkpoint(str(tmp_path / "model"), CFG)
    single = Recognizer.from_checkpoint(str(tmp_path / "model"), CFG,
                                        use_mesh=False)
    assert meshed.mesh is not None and meshed.mesh.size == jax.device_count()
    assert single.mesh is None
    for beam in (0, 3):
        got = meshed.transcribe(paths, beam_size=beam, batch_size=3)
        want = single.transcribe(paths, beam_size=beam, batch_size=3)
        assert got == want


def test_recognizer_missing_checkpoint(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        Recognizer.from_checkpoint(str(tmp_path / "nope"), CFG)


def test_transcribe_cli(tmp_path, rng):
    """transcribe.py end to end: dir + glob expansion, saved-config merge,
    tab-separated output file, order preservation."""
    import transcribe as transcribe_cli

    cfg = CFG.replace(vocab_size=30)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    mdir = str(tmp_path / "model")
    CheckpointManager(mdir).save(1, jax.device_get(ts))
    # training-config snapshot so --use_saved_config provides the arch
    with open(os.path.join(mdir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    adir = tmp_path / "audio"
    adir.mkdir()
    paths = []
    for i, sec in enumerate((0.5, 1.0)):
        p = str(adir / f"u{i}.wav")
        write_wav(p, rng.standard_normal(int(16000 * sec)) * 0.1, 16000)
        paths.append(p)

    out = str(tmp_path / "hyp.tsv")
    texts = transcribe_cli.main([
        str(adir), "--save_dir", mdir, "--use_saved_config", "True",
        "--convert_rate", "0.05", "--output", out,
        "--transcribe_batch", "2"])
    assert len(texts) == 2
    with open(out) as f:
        lines = f.read().splitlines()
    assert [l.split("\t")[0] for l in lines] == paths

    # glob form + beam decoding agree with the API on the same files
    texts_glob = transcribe_cli.main([
        str(adir / "*.wav"), "--save_dir", mdir, "--use_saved_config",
        "True", "--convert_rate", "0.05", "--beam_size", "3"])
    assert len(texts_glob) == 2

    import pytest
    with pytest.raises(FileNotFoundError):
        transcribe_cli.expand_paths([str(adir / "*.mp3")])
