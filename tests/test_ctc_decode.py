"""CTC greedy decoding: collapse/deblank semantics against a NumPy oracle,
and learnability of the CTC head on a separable toy problem."""

import jax
import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.decoding.ctc import ctc_greedy_decode
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.training import trainer

CFG = Config(unit="char", vocab_size=8, feat_dim=8, enc_type="cnn",
             enc_units=16, num_enc_channels=4, num_enc_layers=1,
             dec_units=16, num_dec_layers=1, embedding_size=8,
             attention_size=8, mode="add", dropout_rate=0.0,
             scheduled_sampling=False, ctc=True, ctc_weight=0.5,
             label_smoothing=False, lr=5e-3)


def oracle(path, blank, n):
    # collapse repeats, drop blanks and class 0 (<PAD> never appears in
    # CTC labels; an argmax hit on it must not leak into transcripts)
    out, prev = [], blank
    for p in path[:n]:
        if p != blank and p != prev and p != 0:
            out.append(int(p))
        prev = p
    return out


def test_collapse_matches_oracle(rng):
    params, bn = las.las_init(jax.random.PRNGKey(0), CFG)
    audio = rng.standard_normal((3, 32, 8, 3)).astype(np.float32)
    audiolen = np.asarray([32, 20, 8], np.int32)
    toks, lens = ctc_greedy_decode(params, bn, audio, audiolen, CFG)
    # recompute the argmax path to feed the oracle
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn["listener"], audio, audiolen, CFG,
        is_training=False)
    from automatic_speech_recognition_tpu.ops import layers as L
    logits = L.dense_apply(params["speller"]["ctc_head"], enc_out)
    path = np.argmax(np.asarray(logits), -1)
    for b in range(3):
        want = oracle(path[b], CFG.vocab_size, int(enc_len[b]))
        got = list(np.asarray(toks[b])[:int(lens[b])])
        assert got == want, (b, got, want)


def test_ctc_head_learns_separable_problem(rng):
    """Frames colored by class; CTC must recover the symbol sequence."""
    B, T, L = 8, 32, 4
    ys = rng.integers(3, 7, (B, L)).astype(np.int32)
    audio = np.zeros((B, T, 8, 3), np.float32)
    seg = T // L
    for b in range(B):
        for i in range(L):
            audio[b, i * seg:(i + 1) * seg, ys[b, i] % 8, 0] = 3.0
    audiolen = np.full((B,), T, np.int32)
    ys_pad = np.zeros((B, L + 1), np.int32)
    ys_pad[:, :L] = ys
    ys_pad[:, L] = 2  # <EOS>
    batch = (audio, audiolen, ys_pad, np.full((B,), L + 1, np.int32))
    ts = trainer.create_train_state(jax.random.PRNGKey(1), CFG)
    for _ in range(150):
        ts, m = trainer.train_step(ts, batch, CFG, dec_steps=L + 1)
    toks, lens = ctc_greedy_decode(ts.params, ts.bn_state, audio, audiolen,
                                   CFG)
    errors = 0
    for b in range(B):
        got = list(np.asarray(toks[b])[:int(lens[b])])
        want = [t for t in ys[b]]  # without EOS
        if got[:L] != want:
            errors += 1
    assert errors <= 2, (errors, np.asarray(toks)[:3], ys[:3])


def test_ctc_compat_drop_last_quirk(rng):
    """ctc_compat_drop_last reproduces the reference's sparse off-by-one
    (las/las.py:338): the loss equals computing correct CTC on labels with
    the batch's final non-PAD token manually removed."""
    import jax.numpy as jnp
    B, T, V = 3, 12, CFG.vocab_size
    logits = jnp.asarray(rng.standard_normal((B, T, V + 1)), jnp.float32)
    enc_len = jnp.asarray([12, 10, 8], jnp.int32)
    y = np.zeros((B, 6), np.int32)
    y[0, :4] = [3, 4, 5, 2]
    y[1, :3] = [6, 7, 2]
    y[2, :5] = [3, 3, 4, 5, 2]
    quirk = float(las.ctc_loss(logits, jnp.asarray(y), enc_len,
                               CFG.replace(ctc_compat_drop_last=True)))
    y_ref = y.copy()
    y_ref[2, 4] = 0  # last non-PAD of the last row removed
    manual = float(las.ctc_loss(logits, jnp.asarray(y_ref), enc_len, CFG))
    np.testing.assert_allclose(quirk, manual, rtol=1e-6)
    # default path is unaffected
    correct = float(las.ctc_loss(logits, jnp.asarray(y), enc_len, CFG))
    assert abs(correct - quirk) > 1e-6


def test_eval_decoder_ctc_greedy_cli(tmp_path, rng):
    """`test.py --eval_decoder ctc_greedy` runs the encoder-only CTC path
    end-to-end: tiny --ctc training on fabricated shards, then a CTC
    greedy eval that must produce prediction dumps and a finite WER."""
    import os

    from automatic_speech_recognition_tpu.data import shards
    import test as test_cli
    import train as train_cli

    root = str(tmp_path)
    feats = [rng.standard_normal((48, 13, 3)).astype(np.float32)
             for _ in range(8)]
    tokens = [np.asarray([4 + (i % 3), 5, 2], np.int32) for i in range(8)]
    os.makedirs(f"{root}/shards")
    shards.write_shard(f"{root}/shards/train-1.arsh", feats, tokens)
    shards.write_shard(f"{root}/shards/dev-1.arsh", feats[:4], tokens[:4])

    flags = ["--unit", "char", "--feat_dim", "13",
             "--shard_dir", f"{root}/shards", "--save_dir", f"{root}/model",
             "--log_dir", f"{root}/log", "--summary_dir", f"{root}/sum",
             "--enc_units", "8", "--num_enc_channels", "4",
             "--num_enc_layers", "1", "--dec_units", "8",
             "--num_dec_layers", "1", "--embedding_size", "8",
             "--attention_size", "8", "--mode", "add",
             "--dropout_rate", "0.0", "--scheduled_sampling", "False",
             "--ctc", "True", "--ctc_weight", "0.5",
             "--bucket_boundaries_train", "128",
             "--bucket_batch_sizes", "8", "--max_tokenlen_train", "8"]
    train_cli.main(flags + ["--epoch", "1", "--steps_per_epoch", "2"])
    test_cli.main(flags + ["--split", "dev",
                           "--eval_decoder", "ctc_greedy",
                           "--bucket_boundaries_eval", "128"])
    pred = open(f"{root}/log/test_pred.txt").read().splitlines()
    assert len(pred) == 4
    # rejects decoders that don't exist, and ctc_greedy without --ctc
    with pytest.raises(ValueError, match="eval_decoder"):
        test_cli.main(flags + ["--split", "dev",
                               "--eval_decoder", "nope"])
    i = flags.index("--ctc")
    no_ctc_flags = flags[:i] + flags[i + 2:]
    with pytest.raises(ValueError, match="ctc_greedy needs"):
        test_cli.main(no_ctc_flags + ["--split", "dev",
                                      "--eval_decoder", "ctc_greedy"])
