"""CTC greedy decoding for the auxiliary CTC head.

The reference trains an optional CTC head (las/las.py:75-79, :335-349) but
never decodes it.  This completes the path: best-path (greedy) CTC
decoding — argmax per frame, collapse repeats, drop blanks — as a jitted,
batched program, so `--ctc` models can be evaluated from the encoder alone
(useful as a fast sanity signal before attention-decoder training
converges).

Blank id = vocab_size, matching the training loss (models/las.py:ctc_loss).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import las
from ..ops import layers as L


@functools.partial(jax.jit, static_argnames=("cfg",))
def ctc_greedy_decode(params, bn_state, audio, audiolen, cfg: Config
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-path CTC decode.

    Returns (tokens (B, T_enc) int32 padded with 0/<PAD>, lengths (B,)).
    """
    params, audio = las.compute_cast(cfg, params, audio)
    enc_out, enc_len, _ = las.listener_apply(
        params["listener"], bn_state["listener"], audio, audiolen, cfg,
        is_training=False)
    logits = L.dense_apply(params["speller"]["ctc_head"], enc_out)
    blank = cfg.vocab_size
    path = jnp.argmax(logits, axis=-1)                     # (B, T)
    T = path.shape[1]
    valid = jnp.arange(T)[None, :] < enc_len[:, None]
    prev = jnp.pad(path[:, :-1], ((0, 0), (1, 0)), constant_values=blank)
    # collapse repeats, drop blanks AND class 0 (<PAD>): labels never
    # contain 0 (ctc_loss marks it as label padding), so an argmax hit on
    # the untrained PAD class must not masquerade as a real token — the
    # output contract uses 0 exclusively as right-padding
    keep = (path != blank) & (path != prev) & (path != 0) & valid

    def compact(row_path, row_keep):
        # stable left-compaction of kept symbols under static shapes:
        # kept symbol k goes to position (#kept before it); dropped
        # symbols scatter out of range and are discarded (mode='drop')
        idx = jnp.cumsum(row_keep) - 1
        safe_idx = jnp.where(row_keep, idx, T)
        out = jnp.zeros((T,), jnp.int32).at[safe_idx].set(
            row_path.astype(jnp.int32), mode="drop")
        return out, jnp.sum(row_keep).astype(jnp.int32)

    tokens, lengths = jax.vmap(compact)(path, keep)
    return tokens, lengths
