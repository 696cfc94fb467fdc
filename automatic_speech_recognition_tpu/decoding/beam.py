"""Fully on-device batched beam search with optional RNNLM shallow fusion.

The reference decodes on the host: 2-3 sess.runs PER OUTPUT TOKEN per
utterance, NumPy argsort bookkeeping, batch size hard-limited to 1
(las/beam_search.py:61-158, :70-72).  Here the entire search is ONE jitted
program: beams live as a (K, ...) batch inside a lax.while_loop, utterances
are vmapped, so a whole eval batch decodes in a single device call.

Reference semantics reproduced exactly (las/beam_search.py):
- scores accumulate RAW decoder logits, not log-softmax (:123-124 reads
  `logits` straight from the dense output); a documented compat switch
  (`logprob=True`) enables proper log-softmax scoring instead.
- step 0 expands only one beam (the K initial hypotheses are identical
  copies; :119).
- `<SOS>` re-emission is skipped for t > 0 (:127-128).
- per-step selection takes the global top-K over all active beams'
  expansions, after pruning each beam to its TOP_EXPANSIONS (=64) best
  next tokens exactly like the reference (:123).  For K <= 64 the pruning
  can never change the global top-K (each selected candidate is at worst
  the K-th best of its own beam), so it is compiled out.  All candidates
  at step t share length t+1, so the length normalization (:306) cannot
  affect per-step selection — only the final ranking of finished
  hypotheses, where it IS applied.  (Tie handling differs in the
  measure-zero case of exactly-equal float logits at the 64th place:
  the reference's argsort keeps exactly 64, we keep all ties.)
- hypotheses ending in `<EOS>` retire to a finished bank and their slot
  stops competing (:148-152); the search stops when the bank holds K
  hypotheses or after dec_step = audiolen*convert_rate steps (:94, :78),
  in which case still-active beams join the bank (:155-156).
- LM shallow fusion: ids shifted by -2 into the LM vocab, one LM step per
  beam per decode step, `logits[:, 2:] += lm_weight * lm_logits`
  (:109-116, :226-236).  A shifted `<SOS>` (= -1) embeds as a zero vector.

Beyond-reference: joint CTC/attention one-pass decoding
(cfg.ctc_beam_weight w > 0, requires a --ctc-trained checkpoint and
logprob scoring): per-step score = (1-w) * logP_att + w * dPsi, where
dPsi is the CTC prefix-probability increment from decoding/ctc_prefix.py
(Watanabe et al. 2017).  The LM term, when enabled, stays inside the
attention logits exactly as the reference applies it.

Beyond-reference: attention-coverage scoring of retired hypotheses,
two formulations (both target the documented beam failure modes —
early-EOS truncations and insertion loops, benchmarks/WER_SYNTH.md):

- GNMT penalty (cfg.beam_coverage_penalty beta > 0; Wu et al. 2016
  eq. 14): score += beta * sum_j log(min(sum_t alpha_tj, 1)) over real
  frames.  Measured on char ASR this backfires: decode steps are far
  fewer than encoder frames, so insertion loops accumulate MORE
  coverage than correct hypotheses (see WER_SYNTH.md).
- Chorowski count reward (cfg.beam_coverage_reward beta > 0, threshold
  cfg.beam_coverage_tau; Chorowski & Jaitly 2017 sec. 4):
  score += beta * |{real frames j : sum_t alpha_tj > tau}|.  Bounded
  per frame — loops gain nothing after crossing tau on their parked
  region, truncations forfeit the uncovered tail.

Beyond-reference: EOS end detection (cfg.beam_eos_margin >= 0, same
paper): an EOS expansion is admitted only when its per-step score is
within the margin of the best non-EOS token's, blocking the cheap early
retirements that length normalization otherwise promotes.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import char_rnn, las
from ..ops import attention as att
from ..ops import layers as L
from . import ctc_prefix

log = logging.getLogger("beam")

NEG = -1.0e30
PAD_ID = 0
SOS_ID = 1
EOS_ID = 2
# per-beam expansion budget before global top-K (las/beam_search.py:123)
TOP_EXPANSIONS = 64


def prune_expansions(step_scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep each row's top-k entries, mask the rest to NEG
    (the reference's per-beam `np.argsort(logits[i])[-64:]`,
    las/beam_search.py:123).  No-op when k >= row width."""
    if k >= step_scores.shape[-1]:
        return step_scores
    kth = jax.lax.top_k(step_scores, k)[0][..., -1:]
    return jnp.where(step_scores >= kth, step_scores, NEG)


def _length_div(cfg: Config, length):
    """Divisor for length-normalized hypothesis ranking.

    Default (beam_len_penalty < 0): the reference's plain average,
    score/len (las/beam_search.py:297-312 with NORM=True).  A
    non-negative value alpha switches to the GNMT penalty
    ((5 + len)/6)**alpha — alpha 0 disables normalization entirely,
    alpha in (0, 1) damps the early-EOS preference the plain average
    shows on well-calibrated models (see benchmarks/WER_SYNTH.md).
    """
    length = length.astype(jnp.float32)
    if cfg.beam_len_penalty < 0:
        return length
    return ((5.0 + length) / 6.0) ** cfg.beam_len_penalty


class BeamResult(NamedTuple):
    tokens: jnp.ndarray   # (B, K, max_steps) generated ids (EOS included)
    lengths: jnp.ndarray  # (B, K) generated token counts
    scores: jnp.ndarray   # (B, K) length-normalized scores, best first


def _gather_state(tree, idx):
    return jax.tree_util.tree_map(lambda s: s[idx], tree)


def _beam_search_single(speller_params, cfg: Config, enc_out, enc_len,
                        dec_step, max_steps: int, beam_size: int,
                        logprob: bool, lm_params, lm_cfg, ctc_logp=None):
    """Beam search for ONE utterance; vmapped over the batch by the caller.

    enc_out: (T, H); enc_len: scalar; dec_step: scalar step budget;
    ctc_logp: (T, V+1) CTC-head log-probs for joint decoding, or None.
    """
    K, V = beam_size, cfg.vocab_size
    T, H = enc_out.shape
    use_ctc = ctc_logp is not None and cfg.ctc_beam_weight > 0
    use_cov = (cfg.beam_coverage_penalty > 0
               or cfg.beam_coverage_reward > 0)
    if use_cov:
        cov_beta = float(cfg.beam_coverage_penalty)
        cov_reward = float(cfg.beam_coverage_reward)
        cov_tau = float(cfg.beam_coverage_tau)
        real_frames = jnp.arange(T) < enc_len  # (T,)

        def coverage_penalty(cum_align):
            """Coverage terms over real frames.  GNMT eq. 14
            (beta * sum_j log(min(c_j, 1)); masked-softmax alphas are
            strictly positive on real frames, so the log is finite — the
            1e-8 floor only guards bf16 underflow) and/or the
            Chorowski count reward (beta * |{j : c_j > tau}|)."""
            out = jnp.zeros(cum_align.shape[:-1], jnp.float32)
            if cov_beta > 0:
                cov = jnp.log(jnp.clip(cum_align, 1e-8, 1.0))
                out = out + cov_beta * jnp.sum(
                    jnp.where(real_frames[None, :], cov, 0.0), axis=-1)
            if cov_reward > 0:
                hit = real_frames[None, :] & (cum_align > cov_tau)
                out = out + cov_reward * jnp.sum(
                    hit.astype(jnp.float32), axis=-1)
            return out
    if use_ctc:
        ctc_w = float(cfg.ctc_beam_weight)
        ctc_x = ctc_prefix.masked_logp(ctc_logp.astype(jnp.float32),
                                       enc_len)
    enc_out_k = jnp.broadcast_to(enc_out, (K, T, H))
    enc_len_k = jnp.broadcast_to(enc_len, (K,))
    # encoder projection shared by every step and every beam
    h_proj_k = jnp.broadcast_to(
        att.precompute_hidden(speller_params["attention"], enc_out),
        (K, T, speller_params["attention"]["w_h"]["w"].shape[-1]))
    # location-conv Toeplitz matrix: batch-independent, shared by all
    # beams and steps (see ops/attention.py module docstring)
    loc_proj = (att.precompute_location(speller_params["attention"], T)
                if cfg.mode == "loc" else None)
    use_lm = lm_params is not None

    class Carry(NamedTuple):
        t: jnp.ndarray
        prev_ids: jnp.ndarray      # (K,)
        prev_align: jnp.ndarray    # (K, T)
        dec_states: jnp.ndarray    # (L, K, U)
        cum: jnp.ndarray           # (K,) cumulative scores
        valid: jnp.ndarray         # (K,) bool, slot still active
        tokens: jnp.ndarray        # (K, max_steps)
        bank_tokens: jnp.ndarray   # (K, max_steps)
        bank_len: jnp.ndarray      # (K,)
        bank_score: jnp.ndarray    # (K,) normalized, NEG if empty
        n_finished: jnp.ndarray
        lm_states: Any
        ctc_r: Any                 # (K, T, 2) CTC forward vars, or ()
        ctc_psi: Any               # (K,) CTC prefix scores, or ()
        cum_align: Any             # (K, T) summed alphas for coverage, or ()

    # decoder activations ride the configured compute dtype; scores
    # (cum/bank) always accumulate float32
    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    init = Carry(
        t=jnp.zeros((), jnp.int32),
        prev_ids=jnp.full((K,), SOS_ID, jnp.int32),
        prev_align=jnp.zeros((K, T), cdt),
        dec_states=jnp.zeros((cfg.num_dec_layers, K, cfg.dec_units),
                             cdt),
        cum=jnp.zeros((K,), jnp.float32),
        # only beam 0 expands at t=0 (las/beam_search.py:119)
        valid=jnp.arange(K) == 0,
        tokens=jnp.zeros((K, max_steps), jnp.int32),
        bank_tokens=jnp.zeros((K, max_steps), jnp.int32),
        bank_len=jnp.zeros((K,), jnp.int32),
        bank_score=jnp.full((K,), NEG, jnp.float32),
        n_finished=jnp.zeros((), jnp.int32),
        lm_states=(char_rnn.zero_state(lm_cfg, K) if use_lm else ()),
        ctc_r=(jnp.broadcast_to(ctc_prefix.init_state(ctc_x), (K, T, 2))
               if use_ctc else ()),
        ctc_psi=(jnp.zeros((K,), jnp.float32) if use_ctc else ()),
        cum_align=(jnp.zeros((K, T), jnp.float32) if use_cov else ()),
    )

    def cond(c: Carry):
        return (c.t < dec_step) & (c.n_finished < K)

    def body(c: Carry) -> Carry:
        prev_emb = L.embedding_lookup(speller_params["embedding"], c.prev_ids)
        logits, new_states, alphas = las.decode_step(
            speller_params, cfg, enc_out_k, enc_len_k, c.dec_states,
            prev_emb, c.prev_align, h_proj_k, loc_proj)
        # beam scores accumulate in float32 even under bf16 compute
        logits = logits.astype(jnp.float32)
        if use_lm:
            lm_logits, new_lm_states = char_rnn.lm_step(
                lm_params, lm_cfg, c.prev_ids - 2, c.lm_states)
            logits = logits.at[:, 2:].add(cfg.lm_weight * lm_logits)
        else:
            new_lm_states = c.lm_states
        step_scores = jax.nn.log_softmax(logits, -1) if logprob else logits
        if use_ctc:
            # at t=0 the prefix is empty: no token can be a "repeat"
            last_ids = jnp.where(c.t > 0, c.prev_ids, -1)
            psi_delta, ctc_r_all, ctc_psi_all = ctc_prefix.step(
                ctc_x, c.ctc_r, c.ctc_psi, last_ids, c.t == 0)
            step_scores = (1.0 - ctc_w) * step_scores + ctc_w * psi_delta
        if cfg.beam_eos_margin >= 0:
            # end detection (Chorowski & Jaitly 2017 sec. 4): EOS may only
            # expand when it scores within the margin of the best other
            # token, blocking cheap early retirements.  "Other" excludes
            # the control ids SOS and PAD: neither is ever a training
            # target (cross_entropy masks y==0, SOS is never emitted), so
            # their unconstrained logits would be phantom competitors
            # able to block EOS indefinitely.
            best_other = jnp.max(
                step_scores.at[:, EOS_ID].set(NEG).at[:, SOS_ID].set(NEG)
                .at[:, PAD_ID].set(NEG), axis=-1)
            eos_ok = (step_scores[:, EOS_ID]
                      >= best_other - cfg.beam_eos_margin)
            step_scores = step_scores.at[:, EOS_ID].set(
                jnp.where(eos_ok, step_scores[:, EOS_ID], NEG))
        if K > TOP_EXPANSIONS:
            # only then can pruning change the global top-K selection
            step_scores = prune_expansions(step_scores, TOP_EXPANSIONS)

        cand = c.cum[:, None] + step_scores                   # (K, V)
        cand = jnp.where(c.valid[:, None], cand, NEG)
        # skip <SOS> re-emission for t > 0 (las/beam_search.py:127)
        sos_penalty = jnp.where(c.t > 0, NEG, 0.0)
        cand = cand.at[:, SOS_ID].add(sos_penalty)

        scores, flat_idx = jax.lax.top_k(cand.reshape(-1), K)
        parent = flat_idx // V
        tok = flat_idx % V

        new_tokens = c.tokens[parent].at[:, c.t].set(tok)
        # a slot is `real` iff it descends from an actual candidate; when
        # fewer than K candidates exist (t=0, or pruned rows) the surplus
        # slots carry ~NEG scores and must not finish or enter the bank
        real = scores > NEG * 0.5
        eos = (tok == EOS_ID) & real
        norm = scores / _length_div(cfg, c.t + 1)
        if use_cov:
            # each child's attention history = parent's history + the
            # alignment the parent just consumed producing this token
            new_cum_align = (c.cum_align[parent]
                             + alphas[parent].astype(jnp.float32))
            norm = norm + coverage_penalty(new_cum_align)
        else:
            new_cum_align = c.cum_align

        # merge newly finished hypotheses into the bank, keep best K
        cat_scores = jnp.concatenate([c.bank_score,
                                      jnp.where(eos, norm, NEG)])
        cat_tokens = jnp.concatenate([c.bank_tokens, new_tokens])
        cat_len = jnp.concatenate([c.bank_len,
                                   jnp.full((K,), c.t + 1, jnp.int32)])
        bank_score, bidx = jax.lax.top_k(cat_scores, K)
        return Carry(
            t=c.t + 1,
            prev_ids=tok,
            prev_align=alphas[parent],
            dec_states=new_states[:, parent],
            cum=jnp.where(eos, NEG, scores),
            valid=~eos & real,
            tokens=new_tokens,
            bank_tokens=cat_tokens[bidx],
            bank_len=cat_len[bidx],
            bank_score=bank_score,
            n_finished=c.n_finished + jnp.sum(eos).astype(jnp.int32),
            lm_states=(_gather_state(new_lm_states, parent)
                       if use_lm else c.lm_states),
            ctc_r=(ctc_r_all[parent, tok] if use_ctc else c.ctc_r),
            ctc_psi=(ctc_psi_all[parent, tok] if use_ctc else c.ctc_psi),
            cum_align=new_cum_align,
        )

    c = jax.lax.while_loop(cond, body, init)

    # step budget exhausted -> still-active beams join the bank
    # (las/beam_search.py:155-156)
    exhausted = (c.t >= dec_step) & c.valid
    live_score = c.cum / _length_div(cfg, jnp.maximum(c.t, 1))
    if use_cov:
        live_score = live_score + coverage_penalty(c.cum_align)
    live_norm = jnp.where(exhausted, live_score, NEG)
    cat_scores = jnp.concatenate([c.bank_score, live_norm])
    cat_tokens = jnp.concatenate([c.bank_tokens, c.tokens])
    cat_len = jnp.concatenate([c.bank_len,
                               jnp.broadcast_to(c.t, (K,)).astype(jnp.int32)])
    final_score, idx = jax.lax.top_k(cat_scores, K)
    return cat_tokens[idx], cat_len[idx], final_score


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "beam_size", "logprob", "lm_cfg"))
def beam_search(params, bn_state, audio, audiolen, cfg: Config,
                max_steps: int, beam_size: int = 8, logprob: bool = False,
                lm_params=None, lm_cfg: Optional[char_rnn.LMConfig] = None
                ) -> BeamResult:
    """Batched beam decode: (B, T, D, 3) audio features -> BeamResult.

    max_steps: static bound (convert_rate * padded frames); per utterance
    the true budget is convert_rate * audiolen (las/beam_search.py:78).
    """
    if ((cfg.beam_coverage_penalty > 0 or cfg.beam_coverage_reward > 0)
            and not logprob):
        # mathematically fine (adds a log-domain term to the logit-sum
        # score) but the two scales aren't calibrated to each other.
        # Lives here, not in the CLIs, so every beam entry point
        # (decode.py, test.py, transcribe.py, api.Recognizer) warns;
        # fires at trace time, i.e. once per compiled configuration.
        log.warning("coverage scoring is tuned for log-prob scoring; "
                    "consider --beam_logprob True")
    params, audio = las.compute_cast(cfg, params, audio)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    dec_step = (audiolen.astype(jnp.float32)
                * cfg.convert_rate).astype(jnp.int32)
    dec_step = jnp.minimum(jnp.maximum(dec_step, 1), max_steps)

    fn = functools.partial(_beam_search_single, params["speller"], cfg,
                           max_steps=max_steps, beam_size=beam_size,
                           logprob=logprob, lm_params=lm_params,
                           lm_cfg=lm_cfg)
    if cfg.ctc_beam_weight > 0:
        if not logprob:
            raise ValueError(
                "joint CTC decoding (ctc_beam_weight > 0) mixes log "
                "probabilities; raw-logit scoring is meaningless there — "
                "pass --beam_logprob True")
        if "ctc_head" not in params["speller"]:
            raise ValueError(
                "ctc_beam_weight > 0 needs a checkpoint trained with "
                "--ctc True (no ctc_head in the restored parameters)")
        ctc_logp = jax.nn.log_softmax(
            L.dense_apply(params["speller"]["ctc_head"],
                          enc_out).astype(jnp.float32), -1)
        tokens, lengths, scores = jax.vmap(
            lambda eo, el, ds, cl: fn(eo, el, ds, ctc_logp=cl))(
                enc_out, enc_len, dec_step, ctc_logp)
    else:
        tokens, lengths, scores = jax.vmap(fn)(enc_out, enc_len, dec_step)
    return BeamResult(tokens, lengths, scores)
