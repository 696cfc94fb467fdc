"""Beam-search correctness: the fused on-device search must match a slow
host-side reimplementation of the reference algorithm (las/beam_search.py:
61-158) step for step — same expansion rule, SOS skip, EOS retirement,
length-normalized final selection.

Also: beam=1 equals greedy argmax, and LM fusion changes scores the
documented way.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.decoding import beam as beam_lib
from automatic_speech_recognition_tpu.models import char_rnn, las
from automatic_speech_recognition_tpu.ops import layers as L

CFG = Config(unit="char", vocab_size=12, feat_dim=8, enc_type="cnn",
             enc_units=12, num_enc_channels=4, num_enc_layers=1,
             dec_units=12, num_dec_layers=2, embedding_size=8,
             attention_size=8, mode="add", dropout_rate=0.0,
             scheduled_sampling=False, apply_bn=False)


def host_reference_beam(speller_params, cfg, enc_out, enc_len, dec_step,
                        beam_size, lm_params=None, lm_cfg=None,
                        lm_weight=0.5, logprob=False,
                        len_div=lambda L: L, cov_beta=0.0,
                        cov_reward=0.0, cov_tau=0.5, eos_margin=None):
    """Reference algorithm, host loop (las/beam_search.py:61-158).
    cov_beta > 0 adds the GNMT coverage penalty, cov_reward > 0 the
    Chorowski count reward, to the FINAL ranking of retired hypotheses
    only (per-step selection stays on raw scores, matching the device
    search)."""
    K, V = beam_size, cfg.vocab_size
    T = enc_out.shape[0]
    beams = [dict(ids=[1], logp=0.0, align=np.zeros(T, np.float32),
                  cum=np.zeros(T, np.float32),
                  state=np.zeros((cfg.num_dec_layers, cfg.dec_units),
                                 np.float32),
                  lm_state=(char_rnn.zero_state(lm_cfg, 1)
                            if lm_params is not None else None))
             for _ in range(K)]

    def cov_penalty(b):
        out = 0.0
        if cov_beta > 0.0:
            cov = np.log(np.clip(b["cum"][:int(enc_len)], 1e-8, 1.0))
            out += cov_beta * float(np.sum(cov))
        if cov_reward > 0.0:
            out += cov_reward * float(
                np.sum(b["cum"][:int(enc_len)] > cov_tau))
        return out
    finished = []
    t = 0
    while t < dec_step and len(finished) < K:
        n = len(beams) if t > 0 else 1
        prev_ids = jnp.asarray([b["ids"][-1] for b in beams[:n]], jnp.int32)
        aligns = jnp.asarray(np.stack([b["align"] for b in beams[:n]]))
        states = jnp.asarray(
            np.stack([b["state"] for b in beams[:n]], axis=1))
        emb = L.embedding_lookup(speller_params["embedding"], prev_ids)
        logits, new_states, alphas = las.decode_step(
            speller_params, cfg, jnp.broadcast_to(enc_out, (n, T, enc_out.shape[1])),
            jnp.broadcast_to(enc_len, (n,)), states, emb, aligns)
        logits = np.array(logits)
        if lm_params is not None:
            lm_sts = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *[b["lm_state"] for b in beams[:n]])
            lm_logits, lm_new = char_rnn.lm_step(lm_params, lm_cfg,
                                                 prev_ids - 2, lm_sts)
            logits[:, 2:] += lm_weight * np.asarray(lm_logits)
        if logprob:
            logits = logits - np.log(np.sum(np.exp(
                logits - logits.max(-1, keepdims=True)), -1,
                keepdims=True)) - logits.max(-1, keepdims=True)
        new_states = np.asarray(new_states)
        alphas = np.asarray(alphas)
        bank = []
        for i in range(n):
            row = logits[i].copy()
            if (eos_margin is not None
                    and row[2] < max(v for k, v in enumerate(row)
                                     if k not in (0, 1, 2)) - eos_margin):
                # gate BEFORE the per-beam top-64 prune (a blocked EOS
                # must not consume an expansion slot), and measure the
                # margin against the best non-control token — SOS's
                # unconstrained logit must not block EOS
                row[2] = -1e30
            top = np.argsort(row)[-64:]
            for j in top:
                if t > 0 and j == 1:
                    continue
                if row[j] <= -1e29:  # gate-blocked EOS
                    continue
                b = beams[i]
                item = dict(ids=b["ids"] + [int(j)],
                            logp=b["logp"] + float(logits[i][j]),
                            align=alphas[i],
                            cum=b["cum"] + alphas[i],
                            state=new_states[:, i])
                if lm_params is not None:
                    item["lm_state"] = jax.tree_util.tree_map(
                        lambda s: s[i:i + 1], lm_new)
                else:
                    item["lm_state"] = None
                bank.append(item)
        norm = [b["logp"] / len_div(len(b["ids"]) - 1) for b in bank]
        keep = np.argsort(norm)[-K:]
        beams = []
        for i in keep:
            if bank[i]["ids"][-1] == 2:
                finished.append(bank[i])
            else:
                beams.append(bank[i])
        t += 1
    if t == dec_step:
        finished.extend(beams)
    norm = [b["logp"] / len_div(len(b["ids"]) - 1) + cov_penalty(b)
            for b in finished]
    best = finished[int(np.argsort(norm)[-1])]
    return best["ids"][1:], max(norm)


def _setup(seed=0, B=2, T=24):
    rng = np.random.default_rng(seed)
    params, bn_state = las.las_init(jax.random.PRNGKey(seed), CFG)
    audio = jnp.asarray(rng.standard_normal((B, T, CFG.feat_dim, 3)),
                        jnp.float32)
    audiolen = jnp.asarray([T, T - 6], jnp.int32)
    return params, bn_state, audio, audiolen


@pytest.mark.parametrize("beam_size", [1, 4])
def test_matches_host_reference(beam_size):
    params, bn_state, audio, audiolen = _setup()
    max_steps = 8
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, CFG,
                               max_steps=max_steps, beam_size=beam_size)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, CFG,
        is_training=False)
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * CFG.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], CFG, enc_out[b], enc_len[b], dec_step,
            beam_size)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids, (list(got), ids)
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


def test_logprob_mode_matches_host_reference():
    """Compat switch beam_logprob=True: proper log-softmax scoring."""
    params, bn_state, audio, audiolen = _setup(seed=11)
    max_steps, K = 7, 3
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, CFG,
                               max_steps=max_steps, beam_size=K,
                               logprob=True)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, CFG,
        is_training=False)
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * CFG.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], CFG, enc_out[b], enc_len[b], dec_step, K,
            logprob=True)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


def test_beam1_equals_greedy_prefix():
    """With beam=1 and raw-logit scoring, the emitted sequence equals the
    greedy argmax rollout (up to EOS)."""
    from automatic_speech_recognition_tpu.training import trainer
    params, bn_state, audio, audiolen = _setup(seed=3)
    max_steps = 8
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, CFG,
                               max_steps=max_steps, beam_size=1)
    _, y_hat = trainer.eval_forward(params, bn_state, audio, audiolen, CFG,
                                    dec_steps=max_steps)
    for b in range(audio.shape[0]):
        n = int(res.lengths[b, 0])
        dec_step = min(max(int(audiolen[b] * CFG.convert_rate), 1), max_steps)
        greedy = np.asarray(y_hat[b])[:dec_step]
        got = np.asarray(res.tokens[b, 0])[:n]
        # beam-1 stops at EOS and (unlike greedy) skips <SOS> re-emission
        # (las/beam_search.py:127) — compare up to whichever comes first
        limit = n
        stop = np.where(greedy == 2)[0]
        if len(stop) and stop[0] < limit:
            limit = int(stop[0]) + 1
        sos = np.where(greedy == 1)[0]
        if len(sos) and sos[0] < limit:
            limit = int(sos[0])
        assert list(got[:limit]) == list(greedy[:limit])


def test_prune_expansions_masks_all_but_topk():
    """Per-beam expansion pruning (las/beam_search.py:123): only each
    row's top-k survive; everything else is NEG."""
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((3, 100)), jnp.float32)
    pruned = np.asarray(beam_lib.prune_expansions(scores, 64))
    for i in range(3):
        keep = np.argsort(np.asarray(scores[i]))[-64:]
        masked = np.setdiff1d(np.arange(100), keep)
        np.testing.assert_array_equal(pruned[i, keep], np.asarray(scores)[i, keep])
        assert (pruned[i, masked] == beam_lib.NEG).all()
    # k >= width is the identity
    np.testing.assert_array_equal(
        np.asarray(beam_lib.prune_expansions(scores, 100)),
        np.asarray(scores))


def test_beam_size_above_64_matches_host_reference():
    """K > 64 engages the reference's per-beam top-64 pruning
    (las/beam_search.py:123); vocab 100 > 64 so pruning is live at every
    step, and at t=0 only 64 of the 80 slots are real candidates."""
    big = CFG.replace(vocab_size=100)
    rng = np.random.default_rng(21)
    params, bn_state = las.las_init(jax.random.PRNGKey(21), big)
    B, T = 2, 24
    audio = jnp.asarray(rng.standard_normal((B, T, big.feat_dim, 3)),
                        jnp.float32)
    audiolen = jnp.asarray([T, T - 6], jnp.int32)
    max_steps, K = 6, 80
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, big,
                               max_steps=max_steps, beam_size=K)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, big,
        is_training=False)
    for b in range(B):
        dec_step = min(max(int(audiolen[b] * big.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], big, enc_out[b], enc_len[b], dec_step, K)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids, (list(got), ids)
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


def test_lm_fusion_matches_host_reference():
    params, bn_state, audio, audiolen = _setup(seed=5)
    lm_cfg = char_rnn.LMConfig(vocab_size=CFG.vocab_size - 2, hidden_size=8,
                               embedding_size=6, num_layers=1, model="lstm")
    lm_params = char_rnn.lm_init(jax.random.PRNGKey(7), lm_cfg)
    cfg = CFG.replace(lm_weight=0.3)
    max_steps, K = 6, 3
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                               max_steps=max_steps, beam_size=K,
                               lm_params=lm_params, lm_cfg=lm_cfg)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * cfg.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], cfg, enc_out[b], enc_len[b], dec_step, K,
            lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=cfg.lm_weight)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


def test_bf16_compute_dtype_is_honored():
    """--dtype bfloat16 must reach beam decode (compute_cast at entry)
    and still produce float32 scores and near-f32 hypotheses."""
    params, bn_state, audio, audiolen = _setup()
    cfg16 = CFG.replace(dtype="bfloat16")
    r32 = beam_lib.beam_search(params, bn_state, audio, audiolen, CFG,
                               max_steps=8, beam_size=3)
    r16 = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg16,
                               max_steps=8, beam_size=3)
    assert r16.scores.dtype == jnp.float32
    # the top-1 hypothesis should survive the precision change on this
    # small separable setup (bf16 keeps ~3 significant decimal digits)
    assert list(np.asarray(r16.tokens[0, 0])) == list(np.asarray(r32.tokens[0, 0]))


@pytest.mark.parametrize("alpha", [0.0, 0.6])
def test_gnmt_length_penalty_matches_host_reference(alpha):
    """--beam_len_penalty alpha >= 0 swaps the reference's score/len for
    the GNMT divisor ((5+len)/6)^alpha in BOTH the in-loop bank ranking
    and the final selection; verified against the host algorithm with the
    same divisor."""
    params, bn_state, audio, audiolen = _setup(seed=3)
    cfg = CFG.replace(beam_len_penalty=alpha)
    max_steps, K = 8, 4
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                               max_steps=max_steps, beam_size=K,
                               logprob=True)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    div = lambda L: ((5.0 + L) / 6.0) ** alpha
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * cfg.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], cfg, enc_out[b], enc_len[b], dec_step, K,
            logprob=True, len_div=div)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids, (alpha, b, list(got), ids)
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("beta,reward", [(0.05, 0.0), (0.5, 0.0),
                                         (0.0, 0.2), (0.1, 0.1)])
def test_coverage_scoring_matches_host_reference(beta, reward):
    """--beam_coverage_penalty (GNMT log-sum) and --beam_coverage_reward
    (Chorowski count, threshold --beam_coverage_tau) add their coverage
    terms to every retired hypothesis's ranking score; per-step selection
    is untouched.  Verified against the host algorithm with the same
    terms, separately and combined."""
    params, bn_state, audio, audiolen = _setup(seed=5)
    cfg = CFG.replace(beam_coverage_penalty=beta,
                      beam_coverage_reward=reward, beam_coverage_tau=0.4)
    max_steps, K = 8, 4
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                               max_steps=max_steps, beam_size=K,
                               logprob=True)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * cfg.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], cfg, enc_out[b], enc_len[b], dec_step, K,
            logprob=True, cov_beta=beta, cov_reward=reward, cov_tau=0.4)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids, (beta, reward, b, list(got), ids)
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)
        if reward == 0.0:
            # the penalty is a sum of logs of probabilities-capped-at-1:
            # <= 0, so the cp-included winner can only score below the
            # cp-free winner
            _, score0 = host_reference_beam(
                params["speller"], cfg, enc_out[b], enc_len[b], dec_step,
                K, logprob=True)
            assert score <= score0 + 1e-6


@pytest.mark.parametrize("margin", [0.0, 1.5])
def test_eos_margin_matches_host_reference(margin):
    """--beam_eos_margin m >= 0: an EOS expansion is admitted only when
    score(EOS) >= best non-EOS score - m.  Verified against the host
    algorithm with the same admission rule."""
    params, bn_state, audio, audiolen = _setup(seed=7)
    cfg = CFG.replace(beam_eos_margin=margin)
    max_steps, K = 8, 4
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                               max_steps=max_steps, beam_size=K,
                               logprob=True)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    for b in range(audio.shape[0]):
        dec_step = min(max(int(audiolen[b] * cfg.convert_rate), 1), max_steps)
        ids, score = host_reference_beam(
            params["speller"], cfg, enc_out[b], enc_len[b], dec_step, K,
            logprob=True, eos_margin=margin)
        got = np.asarray(res.tokens[b, 0])[:int(res.lengths[b, 0])]
        assert list(got) == ids, (margin, b, list(got), ids)
        np.testing.assert_allclose(float(res.scores[b, 0]), score,
                                   rtol=1e-4, atol=1e-5)


def test_joint_ctc_score_decomposes():
    """Joint CTC/attention decoding (ctc_beam_weight w): the winning
    hypothesis's reported score must telescope to
    (1-w)*sum_t logP_att(tok_t) + w*psi_ctc(h), divided by the length
    divisor — psi_ctc checked against brute-force alignment enumeration
    (decoding/ctc_prefix.host_reference_prefix_logp)."""
    from automatic_speech_recognition_tpu.decoding import ctc_prefix as cp
    w = 0.4
    cfg = Config(unit="char", vocab_size=5, feat_dim=8, enc_type="cnn",
                 enc_units=12, num_enc_channels=4, num_enc_layers=1,
                 dec_units=12, num_dec_layers=2, embedding_size=8,
                 attention_size=8, mode="add", dropout_rate=0.0,
                 scheduled_sampling=False, apply_bn=False, ctc=True,
                 convert_rate=0.3, ctc_beam_weight=w)
    rng = np.random.default_rng(5)
    params, bn_state = las.las_init(jax.random.PRNGKey(5), cfg)
    B, T, K, max_steps = 2, 24, 3, 8
    audio = jnp.asarray(rng.standard_normal((B, T, cfg.feat_dim, 3)),
                        jnp.float32)
    audiolen = jnp.asarray([T, T - 6], jnp.int32)
    res = beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                               max_steps=max_steps, beam_size=K,
                               logprob=True)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    for b in range(B):
        n = int(res.lengths[b, 0])
        hyp = list(np.asarray(res.tokens[b, 0])[:n])
        # attention part: teacher-force the hypothesis on the host
        prev = 1  # <SOS>
        align = jnp.zeros((1, enc_out.shape[1]), jnp.float32)
        state = jnp.zeros((cfg.num_dec_layers, 1, cfg.dec_units),
                          jnp.float32)
        att_logp = 0.0
        for tok in hyp:
            emb = L.embedding_lookup(params["speller"]["embedding"],
                                     jnp.asarray([prev], jnp.int32))
            logits, state, align = las.decode_step(
                params["speller"], cfg, enc_out[b:b + 1], enc_len[b:b + 1],
                state, emb, align)
            lp = np.asarray(jax.nn.log_softmax(logits[0]))
            att_logp += float(lp[tok])
            prev = tok
        # CTC part: brute-force prefix probability on the true frames
        ctc_logits = L.dense_apply(params["speller"]["ctc_head"],
                                   enc_out[b])
        logp = np.asarray(jax.nn.log_softmax(ctc_logits, -1),
                          np.float64)[:int(enc_len[b])]
        psi = cp.host_reference_prefix_logp(logp, hyp)
        want = ((1.0 - w) * att_logp + w * psi) / n
        np.testing.assert_allclose(float(res.scores[b, 0]), want,
                                   rtol=1e-3, atol=1e-4)


def test_joint_ctc_guards():
    """Raw-logit scoring with ctc_beam_weight is rejected; a checkpoint
    without a CTC head is rejected."""
    cfg = CFG.replace(ctc_beam_weight=0.3)
    params, bn_state, audio, audiolen = _setup()
    with pytest.raises(ValueError, match="beam_logprob"):
        beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                             max_steps=4, beam_size=2, logprob=False)
    with pytest.raises(ValueError, match="ctc_head"):
        beam_lib.beam_search(params, bn_state, audio, audiolen, cfg,
                             max_steps=4, beam_size=2, logprob=True)
