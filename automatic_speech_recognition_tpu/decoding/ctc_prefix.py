"""On-device CTC prefix scoring for joint CTC/attention beam decoding.

Beyond-reference capability (the reference decodes with attention scores
only, las/beam_search.py:119-124): the hybrid one-pass decoder of
Watanabe et al., "Hybrid CTC/Attention Architecture for End-to-End Speech
Recognition" (IEEE JSTSP 2017), mixes the attention log-probability of
each candidate expansion with the CTC *prefix probability*

    psi(h) = P_ctc(output starts with h) = sum_t  phi_{h}(t-1) * x_t(c)

computed by the standard two-variable forward recursion over encoder
frames (r_nb = paths ending in the prefix's last non-blank label,
r_b = paths ending in blank):

    r_nb[t] = logaddexp(r_nb[t-1], phi[t-1]) + x_t(c)
    r_b[t]  = logaddexp(r_nb[t-1], r_b[t-1]) + x_t(blank)
    phi[t]  = logaddexp(r_b[t], c != last ? r_nb[t] : -inf)

TPU-native design: the recursion is a first-order *linear recurrence in
the (logaddexp, +) semiring*, so instead of a T-step sequential scan
inside the beam's while_loop (T sequential dependencies per output
token) it is evaluated with `jax.lax.associative_scan` over 2x2
log-semiring matrices — O(log T) depth, all candidates (K beams x V
tokens) batched in one sweep.

Unlike ESPnet's convention (no EOS in the CTC alphabet), this framework
trains the CTC head on the full target INCLUDING <EOS>
(models/las.py:ctc_loss labels = y), so <EOS> is scored like any other
candidate and needs no end-of-hypothesis special case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1.0e30


def masked_logp(ctc_logp: jnp.ndarray, enc_len) -> jnp.ndarray:
    """Force frames at t >= enc_len to emit blank with probability 1.

    ctc_logp: (T, V+1) log-probs, blank last.  Makes every recursion and
    reduction length-agnostic under static shapes: padded frames add 0 to
    blank-ending paths and -inf to any label emission.
    """
    T, Vp1 = ctc_logp.shape
    valid = (jnp.arange(T) < enc_len)[:, None]
    pad_row = jnp.full((Vp1,), NEG).at[Vp1 - 1].set(0.0)
    return jnp.where(valid, ctc_logp, pad_row[None, :])


def init_state(x: jnp.ndarray) -> jnp.ndarray:
    """Forward variables of the empty prefix: r_nb = -inf everywhere,
    r_b[t] = cumulative blank mass.  x: masked (T, V+1).  Returns (T, 2)
    with [..., 0] = r_nb, [..., 1] = r_b."""
    r_b = jnp.cumsum(x[:, -1])
    r_nb = jnp.full_like(r_b, NEG)
    return jnp.stack([r_nb, r_b], axis=-1)


def _log_matmul(b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 2) semiring product C = B (x) A with + as multiply and
    logaddexp as add: C[i, j] = logaddexp_k(B[i, k] + A[k, j])."""
    return jnp.logaddexp(b[..., :, 0, None] + a[..., None, 0, :],
                         b[..., :, 1, None] + a[..., None, 1, :])


def _log_matvec(b: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 2) x (..., 2) semiring mat-vec."""
    return jnp.logaddexp(b[..., :, 0] + v[..., 0:1],
                         b[..., :, 1] + v[..., 1:2])


def _combine(earlier, later):
    """Compose two affine semiring elements r -> M r (+) v."""
    ma, va = earlier
    mb, vb = later
    return _log_matmul(mb, ma), jnp.logaddexp(_log_matvec(mb, va), vb)


def step(x: jnp.ndarray, r_prev: jnp.ndarray, psi_prev: jnp.ndarray,
         last_ids: jnp.ndarray, first_step: jnp.ndarray):
    """Score every candidate extension of every beam in one shot.

    x: (T, V+1) masked log-probs (blank last); r_prev: (K, T, 2) forward
    variables of each beam's prefix; psi_prev: (K,) prefix scores;
    last_ids: (K,) last emitted token id; first_step: scalar bool (the
    search's step 0, where the prefix is empty and the first frame may
    emit the first label).

    Returns (psi_delta (K, V), r_all (K, V, T, 2), psi_all (K, V)) where
    V is the candidate vocabulary (x's width minus the blank column).
    """
    T = x.shape[0]
    V = x.shape[1] - 1
    K = r_prev.shape[0]
    xb = x[:, -1]                                   # (T,)
    xc = x[:, :V].T                                 # (V, T)

    r_nb_prev = r_prev[..., 0]                      # (K, T)
    r_b_prev = r_prev[..., 1]
    phi_base = jnp.logaddexp(r_nb_prev, r_b_prev)   # (K, T)
    same = (jnp.arange(V)[None, :] == last_ids[:, None])      # (K, V)
    phi = jnp.where(same[:, :, None], r_b_prev[:, None, :],
                    phi_base[:, None, :])           # (K, V, T)
    first0 = jnp.where(first_step, 0.0, NEG)
    phi_shift = jnp.concatenate(
        [jnp.broadcast_to(first0, (K, V, 1)), phi[..., :-1]], axis=-1)

    emit = phi_shift + xc[None]                     # (K, V, T)
    psi = jax.nn.logsumexp(emit, axis=-1)           # (K, V)

    # forward variables of every extended hypothesis via associative scan
    xc_b = jnp.broadcast_to(xc[None], (K, V, T))
    xb_b = jnp.broadcast_to(xb[None, None], (K, V, T))
    row_nb = jnp.stack([xc_b, jnp.full_like(xc_b, NEG)], axis=-1)
    row_b = jnp.stack([xb_b, xb_b], axis=-1)
    m = jnp.stack([row_nb, row_b], axis=-2)         # (K, V, T, 2, 2)
    v = jnp.stack([emit, jnp.full_like(emit, NEG)], axis=-1)  # (K,V,T,2)
    _, v_cum = jax.lax.associative_scan(_combine, (m, v), axis=2)
    r_all = v_cum                                   # (K, V, T, 2)

    psi_delta = psi - psi_prev[:, None]
    return psi_delta, r_all, psi


def host_reference_prefix_logp(x, prefix):
    """Brute-force oracle for tests: enumerate every alignment path and
    sum the probability of all collapsed outputs that start with
    `prefix`.  x: (T, V+1) numpy log-probs (blank last).  Exponential in
    T — tiny shapes only."""
    import itertools

    import numpy as np
    T, Vp1 = x.shape
    blank = Vp1 - 1
    total = -np.inf
    prefix = tuple(prefix)
    for path in itertools.product(range(Vp1), repeat=T):
        out, prev = [], blank
        for p in path:
            if p != blank and p != prev:
                out.append(p)
            prev = p
        if tuple(out[:len(prefix)]) == prefix:
            total = np.logaddexp(total, sum(x[t, p]
                                            for t, p in enumerate(path)))
    return total
