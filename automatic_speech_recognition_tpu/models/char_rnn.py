"""Character RNN language model (JAX), used standalone and for beam-search
shallow fusion.

Functional re-design of the reference's TF1 CharRNN (lang/char_rnn_model.py:
11-282): embedding-or-onehot input -> stacked {rnn | lstm | gru} cells ->
dense softmax head.  The reference quirks kept on purpose:

- 'lstm' is a genuine BasicLSTMCell with forget_bias=0.0
  (lang/char_rnn_model.py:63-65) — unlike the LAS model, whose "lstm"
  helpers are vanilla RNN cells.
- embedding_size <= 0 means one-hot inputs with NO input dropout
  (lang/char_rnn_model.py:30-34).
- dropout is OUTPUT dropout on every cell (DropoutWrapper
  output_keep_prob=1-dropout, lang/char_rnn_model.py:82-85);
  input_dropout applies to the embedded inputs
  (lang/char_rnn_model.py:114-115).  Both train-time only.
- loss is mean sparse softmax CE over all unrolled positions
  (lang/char_rnn_model.py:145-148); ppl = exp(mean loss).
- training is Adam + clip_by_global_norm(max_grad_norm)
  (lang/char_rnn_model.py:186-196).

The unrolled forward is one lax.scan (the reference uses static_rnn with
num_unrollings Python-level copies); the single-step `lm_step` is what the
on-TPU beam search fuses at every decode step.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import layers as L


@dataclass(frozen=True)
class LMConfig:
    """Mirrors train_lm.py flag names/defaults (train_lm.py:42-73)."""
    vocab_size: int = 28
    hidden_size: int = 128
    embedding_size: int = 0          # <=0 -> one-hot input
    num_layers: int = 2
    num_unrollings: int = 10
    batch_size: int = 20
    model: str = "lstm"              # 'rnn' | 'lstm' | 'gru'
    learning_rate: float = 2e-3
    max_grad_norm: float = 5.0
    dropout: float = 0.0
    input_dropout: float = 0.0

    def replace(self, **kw) -> "LMConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "LMConfig":
        d = json.loads(s)
        fields = {f.name for f in dataclasses.fields(LMConfig)}
        return LMConfig(**{k: v for k, v in d.items() if k in fields})

    @property
    def input_size(self) -> int:
        return self.embedding_size if self.embedding_size > 0 else self.vocab_size

    @property
    def effective_input_dropout(self) -> float:
        """No dropout on one-hot representations
        (lang/char_rnn_model.py:30-34)."""
        return self.input_dropout if self.embedding_size > 0 else 0.0


def lm_init(key, cfg: LMConfig) -> Dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    params: Dict = {}
    if cfg.embedding_size > 0:
        params["embedding"] = L.glorot_uniform(
            keys[0], (cfg.vocab_size, cfg.embedding_size))
    in_dim = cfg.input_size
    cell_init = {"rnn": L.rnn_cell_init, "lstm": L.lstm_cell_init,
                 "gru": L.gru_cell_init}[cfg.model]
    for i in range(cfg.num_layers):
        params[f"cell_{i}"] = cell_init(keys[1 + i], in_dim, cfg.hidden_size)
        in_dim = cfg.hidden_size
    params["softmax_w"] = L.glorot_uniform(
        keys[-1], (cfg.hidden_size, cfg.vocab_size))
    params["softmax_b"] = jnp.zeros((cfg.vocab_size,))
    return params


def zero_state(cfg: LMConfig, batch: int):
    """Per-layer zero state; lstm carries (c, h), rnn/gru carry h."""
    if cfg.model == "lstm":
        return tuple((jnp.zeros((batch, cfg.hidden_size)),
                      jnp.zeros((batch, cfg.hidden_size)))
                     for _ in range(cfg.num_layers))
    return tuple(jnp.zeros((batch, cfg.hidden_size))
                 for _ in range(cfg.num_layers))


def _embed(params: Dict, cfg: LMConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup, or one-hot when embedding_size <= 0.

    NOTE: negative ids (the -2 fusion shift applied to <SOS>=1,
    beam_search.py:228-229) produce a zero vector — the defined analogue
    of TF-on-GPU's unchecked gather.
    """
    neg = (ids < 0)
    safe = jnp.maximum(ids, 0)
    if cfg.embedding_size > 0:
        x = jnp.take(params["embedding"], safe, axis=0)
    else:
        x = jax.nn.one_hot(safe, cfg.vocab_size)
    return jnp.where(neg[..., None], 0.0, x)


def lm_step(params: Dict, cfg: LMConfig, ids: jnp.ndarray, state,
            rng=None, is_training: bool = False):
    """One LM step: ids (B,) int32 -> (logits (B, V), new_state).

    Training with rng: input dropout on the embedded ids (zero in one-hot
    mode, lang/char_rnn_model.py:30-34, :114-115) and output dropout on
    every cell (DropoutWrapper output_keep_prob, :82-85).
    """
    train_drop = (is_training and rng is not None
                  and (cfg.dropout > 0 or cfg.effective_input_dropout > 0))
    x = _embed(params, cfg, ids)
    if train_drop:
        keys = jax.random.split(rng, cfg.num_layers + 1)
        x = L.dropout(keys[0], x, cfg.effective_input_dropout, True)
    new_state = []
    for i in range(cfg.num_layers):
        if cfg.model == "lstm":
            x, s = L.lstm_cell_apply(params[f"cell_{i}"], x, state[i],
                                     forget_bias=0.0)
        elif cfg.model == "gru":
            x = L.gru_cell_apply(params[f"cell_{i}"], x, state[i])
            s = x
        else:
            x = L.rnn_cell_apply(params[f"cell_{i}"], x, state[i])
            s = x
        if train_drop:
            # output dropout only affects the stacked input / softmax path;
            # the recurrent state stays undropped (DropoutWrapper semantics)
            x = L.dropout(keys[1 + i], x, cfg.dropout, True)
        new_state.append(s)
    logits = x @ params["softmax_w"] + params["softmax_b"]
    return logits, tuple(new_state)


def lm_apply(params: Dict, cfg: LMConfig, inputs: jnp.ndarray, state,
             rng=None, is_training: bool = False):
    """Unrolled forward: inputs (B, T) -> (logits (B, T, V), final_state)."""
    xs = jnp.swapaxes(inputs, 0, 1)  # time-major
    # static elision: no RNG ops in the scan body unless dropout is live
    drop = (is_training and rng is not None
            and (cfg.dropout > 0 or cfg.effective_input_dropout > 0))

    def step(carry, x):
        state, key = carry
        if drop:
            key, sub = jax.random.split(key)
        else:
            sub = None
        logits, state = lm_step(params, cfg, x, state, sub, is_training)
        return (state, key), logits

    (final_state, _), logits = jax.lax.scan(
        step, (state, rng if rng is not None else jax.random.PRNGKey(0)), xs)
    return jnp.swapaxes(logits, 0, 1), final_state


def lm_loss(params: Dict, cfg: LMConfig, inputs, targets, state,
            rng=None, is_training: bool = False):
    """Mean sparse CE over all positions (lang/char_rnn_model.py:145-148).
    Returns (loss, final_state)."""
    logits, final_state = lm_apply(params, cfg, inputs, state, rng,
                                   is_training)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll), final_state


class LMTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_lm_optimizer(cfg: LMConfig) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                       optax.adam(cfg.learning_rate))


def create_lm_train_state(key, cfg: LMConfig) -> LMTrainState:
    params = lm_init(key, cfg)
    return LMTrainState(params, make_lm_optimizer(cfg).init(params),
                        jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_train_step(ts: LMTrainState, inputs, targets, state, cfg: LMConfig,
                  rng=None):
    """One LM optimization step; carries the recurrent state across steps
    like the reference's stateful epoch loop (lang/char_rnn_model.py:216-232).

    rng drives train-time dropout; None derives a per-step key from the
    step counter so `--dropout`/`--input_dropout` are honored regardless
    of the caller."""
    if rng is None:
        rng = jax.random.fold_in(jax.random.PRNGKey(0), ts.step)

    def loss_fn(p):
        return lm_loss(p, cfg, inputs, targets, state, rng, is_training=True)

    (loss, final_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        ts.params)
    updates, new_opt = make_lm_optimizer(cfg).update(grads, ts.opt_state,
                                                     ts.params)
    new_params = optax.apply_updates(ts.params, updates)
    return (LMTrainState(new_params, new_opt, ts.step + 1), loss,
            final_state)


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_eval_loss(params, inputs, targets, state, cfg: LMConfig):
    return lm_loss(params, cfg, inputs, targets, state)


_jit_lm_step = jax.jit(lm_step, static_argnames=("cfg",))


def sample_seq(params: Dict, cfg: LMConfig, length: int, start_ids,
               rng=None, temperature: float = 1.0,
               max_prob: bool = True) -> list:
    """Greedy / temperature sampling (lang/char_rnn_model.py:246-282):
    warm up on start_ids, then emit `length` ids."""
    state = zero_state(cfg, 1)
    # params is a traced argument (not a captured constant) so repeated
    # sample_seq calls reuse one cached compile of _jit_lm_step
    step = lambda i, s: _jit_lm_step(params, cfg, i, s)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if start_ids:
        for sid in start_ids[:-1]:
            _, state = step(jnp.asarray([sid], jnp.int32), state)
        x = jnp.asarray([start_ids[-1]], jnp.int32)
    else:
        rng, k = jax.random.split(rng)
        x = jax.random.randint(k, (1,), 0, cfg.vocab_size)
    out = []
    for _ in range(length):
        logits, state = step(x, state)
        if max_prob:
            nxt = int(jnp.argmax(logits[0]))
        else:
            rng, k = jax.random.split(rng)
            nxt = int(jax.random.categorical(k, logits[0] / temperature))
        out.append(nxt)
        x = jnp.asarray([nxt], jnp.int32)
    return out


class BatchGenerator:
    """Cursor-based contiguous text batcher (lang/char_rnn_model.py:285-324):
    batch_size cursors spaced text_size//batch_size apart; next() returns
    (num_unrollings+1, batch_size) ids where row 0 repeats the previous
    call's last row."""

    def __init__(self, ids, batch_size: int, n_unrollings: int):
        import numpy as np
        self._ids = np.asarray(ids, np.int32)
        self._batch_size = batch_size
        self._n = n_unrollings
        segment = len(self._ids) // batch_size
        self._cursor = [offset * segment for offset in range(batch_size)]
        self._last = self._next_row()

    def _next_row(self):
        import numpy as np
        row = np.empty((self._batch_size,), np.int32)
        for b in range(self._batch_size):
            row[b] = self._ids[self._cursor[b]]
            self._cursor[b] = (self._cursor[b] + 1) % len(self._ids)
        return row

    def next(self):
        import numpy as np
        rows = [self._last]
        for _ in range(self._n):
            rows.append(self._next_row())
        self._last = rows[-1]
        return np.stack(rows)  # (n_unrollings+1, batch_size)
