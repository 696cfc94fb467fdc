"""Int8 weight-only decoder quantization (ops/quant.py).

TPU-native serving optimization with no reference counterpart: the
decode scan is HBM-bound on its per-step weight stream (RESULTS.md
roofline), so the restored speller kernels are stored int8 + per-channel
scale.  These tests pin (a) the quantizer's error bound, (b) that the
layer dispatch is exact-identity in structure (float path untouched),
(c) greedy decode agreement on a trained model, and (d) the CLI flag
end-to-end through test.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from automatic_speech_recognition_tpu.ops import layers as L
from automatic_speech_recognition_tpu.ops import quant


def test_quantize_matrix_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32) * 0.05)
    qd = quant.quantize_matrix(w)
    assert qd["q"].dtype == jnp.int8
    assert qd["scale"].shape == (256,)
    deq = qd["q"].astype(jnp.float32) * qd["scale"]
    # symmetric per-channel int8: worst-case error is scale/2 per entry
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(qd["scale"]) / 2 + 1e-8
    assert (err <= bound[None, :]).all()


def test_dequant_matmul_close_to_float():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((640, 320)).astype(np.float32) * 0.04)
    x = jnp.asarray(rng.standard_normal((8, 640)).astype(np.float32))
    qd = quant.quantize_matrix(w)
    y_ref = x @ w
    y_q = quant.dequant_matmul(x, qd["q"], qd["scale"])
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    # int8 per-channel on zero-mean random weights: ~0.8% relative —
    # comparable to bf16 activation noise, far under decode margins
    assert rel < 2e-2, rel


def test_layer_dispatch_quantized_vs_float():
    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)
    p = L.rnn_cell_init(key, 48, 32)
    x = jnp.asarray(rng.standard_normal((4, 48)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32) * 0.1)
    ref = L.rnn_cell_apply(p, x, h)
    out = L.rnn_cell_apply(quant.quantize_dense(p), x, h)
    assert float(jnp.max(jnp.abs(out - ref))) < 5e-2  # tanh-squashed
    d = L.dense_init(key, 32, 16)
    xd = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    ref_d = L.dense_apply(d, xd)
    out_d = L.dense_apply(quant.quantize_dense(d), xd)
    rel = float(jnp.linalg.norm(out_d - ref_d)
                / (float(jnp.linalg.norm(ref_d)) + 1e-9))
    assert rel < 2e-2, rel


def test_lstm_cell_quantized_close_and_lm_fusion_runs():
    """The lstm dispatch branch (fusion LM) matches float closely, and a
    quantized LM runs through beam-search shallow fusion."""
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(0)
    p = L.lstm_cell_init(key, 24, 16)
    x = jnp.asarray(rng.standard_normal((4, 24)).astype(np.float32))
    st = (jnp.zeros((4, 16)), jnp.zeros((4, 16)))
    ref_h, _ = L.lstm_cell_apply(p, x, st)
    out_h, _ = L.lstm_cell_apply(quant.quantize_dense(p), x, st)
    assert float(jnp.max(jnp.abs(out_h - ref_h))) < 5e-2

    from automatic_speech_recognition_tpu.models import char_rnn
    lm_cfg = char_rnn.LMConfig(model="lstm", hidden_size=16, num_layers=2,
                               vocab_size=28, embedding_size=8)
    lm_ts = char_rnn.create_lm_train_state(jax.random.PRNGKey(1), lm_cfg)
    lm_q = quant.quantize_lm(lm_ts.params, lm_cfg)
    assert "w_q" in lm_q["cell_0"]
    assert lm_q["softmax_w"].dtype == jnp.float32  # logits layer stays float

    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.models import las
    from automatic_speech_recognition_tpu.decoding import beam
    cfg = Config(vocab_size=30, enc_units=12, num_enc_layers=1,
                 num_enc_channels=4, dec_units=12, num_dec_layers=1,
                 embedding_size=8, attention_size=8, feat_dim=8,
                 mode="add", enc_type="cnn", scheduled_sampling=False,
                 apply_lm=True, lm_weight=0.2)
    params, state = las.las_init(jax.random.PRNGKey(2), cfg)
    audio = jnp.asarray(rng.standard_normal((2, 32, 8, 3)).astype(np.float32))
    qp = quant.quantize_model_params(params, cfg.vocab_size)
    res = beam.beam_search(qp, state, audio, jnp.full((2,), 32, jnp.int32),
                           cfg, max_steps=6, beam_size=2,
                           lm_params=lm_q, lm_cfg=lm_cfg)
    assert np.isfinite(np.asarray(res.scores)).all()


def test_quantize_lm_softmax_and_gru_stay_float():
    from automatic_speech_recognition_tpu.models import char_rnn
    cfg = char_rnn.LMConfig(model="gru", hidden_size=12, num_layers=1,
                            vocab_size=28, embedding_size=6)
    ts = char_rnn.create_lm_train_state(jax.random.PRNGKey(0), cfg)
    assert quant.quantize_lm(ts.params, cfg) is ts.params  # gru: identity


def test_quantize_speller_selects_cells_only_for_small_vocab():
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.models import las
    cfg = Config(vocab_size=30, enc_units=16, num_enc_layers=1,
                 dec_units=16, num_dec_layers=2, embedding_size=8,
                 attention_size=8, feat_dim=4, mode="add")
    params = las.speller_init(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_speller(params, cfg.vocab_size)
    assert "w_q" in qp["cell_0"] and "w_q" in qp["cell_1"]
    assert "w" in qp["out"]  # char vocab: logits stay float
    qp_big = quant.quantize_speller(params, 5000)
    assert "w_q" in qp_big["out"]  # subword vocab: logits quantized too
    # bytes actually shrink (the point of the exercise)
    assert quant.size_bytes(qp) < quant.size_bytes(params)


def test_maybe_quantize_params_validates_mode():
    class C:
        quantize_decoder = "int4"
        vocab_size = 30
    with pytest.raises(ValueError):
        quant.maybe_quantize_params({"speller": {}}, C)


def test_greedy_decode_agreement_trained_model():
    """Train a tiny LAS a few steps, then greedy-decode with float vs
    int8 speller weights: the argmax token streams must agree on a
    model with real (non-noise) decision margins."""
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.models import las
    from automatic_speech_recognition_tpu.training import trainer

    cfg = Config(vocab_size=12, enc_units=24, num_enc_layers=1,
                 num_enc_channels=4, dec_units=24, num_dec_layers=2,
                 embedding_size=12, attention_size=12, feat_dim=8,
                 mode="loc", enc_type="cnn", lr=1e-2,
                 scheduled_sampling=False)
    rng = np.random.default_rng(3)
    B, T, V = 8, 64, 12
    audio = jnp.asarray(rng.standard_normal((B, T, 8, 3)).astype(np.float32))
    audiolen = jnp.full((B,), T, jnp.int32)
    ys = jnp.asarray(rng.integers(3, V, size=(B, 6)), jnp.int32)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    batch = (audio, audiolen, ys, jnp.full((B,), 6, jnp.int32))
    step = jax.jit(lambda ts: trainer.train_step(ts, batch, cfg, 6)[0])
    for _ in range(30):
        ts = step(ts)

    def greedy(params):
        logits, _, _, _, _ = las.las_forward(
            params, ts.bn_state, audio, audiolen, cfg, 8,
            is_training=False)
        return np.asarray(jnp.argmax(logits, -1))

    ids_f = greedy(ts.params)
    ids_q = greedy(quant.quantize_model_params(ts.params, cfg.vocab_size))
    agree = (ids_f == ids_q).mean()
    assert agree > 0.97, agree


def test_decode_cli_and_api_with_quantization(tmp_path, rng):
    """decode.py --quantize_decoder int8 (beam path) and
    Recognizer.from_checkpoint with the flag (greedy/serving path) both
    run end-to-end on a restored checkpoint."""
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.training import trainer
    from automatic_speech_recognition_tpu.training.checkpoint import (
        CheckpointManager)
    from automatic_speech_recognition_tpu.utils.tokenizer import CharEncoder

    d = str(tmp_path)
    flags = ["--unit", "char", "--feat_dim", "8", "--enc_units", "16",
             "--num_enc_channels", "4", "--num_enc_layers", "1",
             "--dec_units", "16", "--num_dec_layers", "2",
             "--embedding_size", "8", "--attention_size", "8",
             "--mode", "add", "--dropout_rate", "0.0",
             "--scheduled_sampling", "False"]
    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_units=16,
                 num_enc_channels=4, num_enc_layers=1, dec_units=16,
                 num_dec_layers=2, embedding_size=8, attention_size=8,
                 mode="add", dropout_rate=0.0, scheduled_sampling=False)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    CheckpointManager(f"{d}/model").save(1, jax.device_get(ts))
    tok = CharEncoder()
    feats = np.empty(3, object)
    toks = np.empty(3, object)
    for i in range(3):
        feats[i] = rng.standard_normal(
            (int(rng.integers(30, 50)), 8, 3)).astype(np.float32)
        toks[i] = np.asarray(tok.encode("HELLO", with_eos=True), np.int32)
    np.save(f"{d}/dev-feats.npy", feats, allow_pickle=True)
    np.save(f"{d}/dev-chars.npy", toks, allow_pickle=True)

    import decode as decode_cli
    wer = decode_cli.main(flags + [
        "--feat_dir", d, "--save_dir", f"{d}/model", "--log_dir", f"{d}/log",
        "--split", "dev", "--beam_size", "2", "--convert_rate", "0.3",
        "--decode_batch", "3", "--decode_pad_quantum", "32",
        "--quantize_decoder", "int8"])
    assert np.isfinite(wer)

    from automatic_speech_recognition_tpu.api import Recognizer
    rec = Recognizer.from_checkpoint(
        f"{d}/model", cfg.replace(convert_rate=0.05,
                                  quantize_decoder="int8"))
    assert "w_q" in rec.params["speller"]["cell_0"]
    sig = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    out = rec.transcribe_signals([sig])
    assert len(out) == 1 and isinstance(out[0], str)


def test_cli_flag_roundtrip():
    from automatic_speech_recognition_tpu.config import parse_args
    cfg = parse_args(["--quantize_decoder", "int8"])
    assert cfg.quantize_decoder == "int8"
    assert parse_args([]).quantize_decoder == "none"
