"""LM pipeline through the real CLIs: train_lm.py -> sample_lm.py ->
decode.py --apply_lm, plus Recognizer.from_checkpoint(lm_dir=...)."""

import os

import jax
import numpy as np

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager
from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

CFG_FLAGS = ["--unit", "char", "--feat_dim", "8", "--enc_units", "16",
             "--num_enc_channels", "4", "--num_enc_layers", "1",
             "--dec_units", "16", "--num_dec_layers", "1",
             "--embedding_size", "8", "--attention_size", "8",
             "--mode", "add", "--dropout_rate", "0.0",
             "--scheduled_sampling", "False"]


def _make_assets(tmp_path, rng):
    d = str(tmp_path)
    # LM corpus + training
    corpus = ("HELLO WORLD. THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG. "
              * 40)
    with open(f"{d}/lm_corpus.txt", "w") as f:
        f.write(corpus)
    import train_lm
    train_lm.main(["--data_file", f"{d}/lm_corpus.txt",
                   "--output_dir", f"{d}/lm", "--num_epochs", "1",
                   "--hidden_size", "12", "--num_layers", "1",
                   "--batch_size", "4", "--num_unrollings", "6"])
    # LAS checkpoint + feature dumps
    tok = CharEncoder()
    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_units=16,
                 num_enc_channels=4, num_enc_layers=1, dec_units=16,
                 num_dec_layers=1, embedding_size=8, attention_size=8,
                 mode="add", dropout_rate=0.0, scheduled_sampling=False)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    CheckpointManager(f"{d}/model").save(1, jax.device_get(ts))
    feats = np.empty(4, object)
    toks = np.empty(4, object)
    for i in range(4):
        feats[i] = rng.standard_normal(
            (int(rng.integers(30, 50)), 8, 3)).astype(np.float32)
        toks[i] = np.asarray(tok.encode("HELLO", with_eos=True), np.int32)
    np.save(f"{d}/dev-feats.npy", feats, allow_pickle=True)
    np.save(f"{d}/dev-chars.npy", toks, allow_pickle=True)
    return d


def test_lm_cli_fusion_roundtrip(tmp_path, rng):
    d = _make_assets(tmp_path, rng)
    assert os.path.exists(f"{d}/lm/result.json")
    assert os.path.exists(f"{d}/lm/vocab.json")

    import sample_lm
    text = sample_lm.main(["--init_dir", f"{d}/lm", "--length", "12"])
    assert isinstance(text, str) and len(text) > 12
    ppl = sample_lm.main(["--init_dir", f"{d}/lm", "--evaluate",
                          "--example_text", "HELLO WORLD."])
    assert np.isfinite(ppl) and ppl > 0

    import decode as decode_cli
    wer = decode_cli.main(CFG_FLAGS + [
        "--feat_dir", d, "--save_dir", f"{d}/model", "--log_dir", f"{d}/log",
        "--lm_dir", f"{d}/lm", "--split", "dev", "--beam_size", "2",
        "--convert_rate", "0.3", "--apply_lm", "True", "--lm_weight", "0.3",
        "--decode_batch", "4", "--decode_pad_quantum", "32"])
    assert np.isfinite(wer)

    from automatic_speech_recognition_tpu.api import Recognizer
    cfg = Config(unit="char", feat_dim=8, enc_units=16, num_enc_channels=4,
                 num_enc_layers=1, dec_units=16, num_dec_layers=1,
                 embedding_size=8, attention_size=8, mode="add",
                 dropout_rate=0.0, scheduled_sampling=False,
                 convert_rate=0.05)
    rec = Recognizer.from_checkpoint(f"{d}/model", cfg, lm_dir=f"{d}/lm")
    assert rec.lm_params is not None
    sig = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    out = rec.transcribe_signals([sig], beam_size=2)
    assert len(out) == 1 and isinstance(out[0], str)
