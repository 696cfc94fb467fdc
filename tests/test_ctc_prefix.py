"""CTC prefix scorer: associative-scan recursion vs brute-force alignment
enumeration, repeat-label handling, length masking, and (in
test_beam_search.py) the joint-decoding integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from automatic_speech_recognition_tpu.decoding import ctc_prefix as cp

T, V = 5, 3          # candidates {0, 1, 2}, blank id 3
NO_LAST = -1         # matches no candidate (fresh hypothesis after <SOS>)


@pytest.fixture
def x(rng):
    logits = rng.standard_normal((T, V + 1)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return jnp.asarray(logp)


def first_step(x, last=NO_LAST):
    r0 = cp.init_state(x)[None]
    return cp.step(x, r0, jnp.zeros((1,)), jnp.array([last]),
                   jnp.array(True))


def test_first_token_matches_bruteforce(x):
    psi_delta, _, _ = first_step(x)
    xn = np.asarray(x, np.float64)
    for c in range(V):
        want = cp.host_reference_prefix_logp(xn, [c])
        np.testing.assert_allclose(float(psi_delta[0, c]), want, rtol=1e-4)


@pytest.mark.parametrize("c1", [0, 1])
def test_second_token_matches_bruteforce(x, c1):
    """Extend by c1, then score every second token — including the
    repeated-label case c2 == c1, which must require an intervening
    blank (phi = r_b only)."""
    _, r_all, psi_all = first_step(x)
    r1 = r_all[:, c1]
    psi1 = psi_all[:, c1]
    psi_delta2, _, psi2 = cp.step(x, r1, psi1, jnp.array([c1]),
                                  jnp.array(False))
    xn = np.asarray(x, np.float64)
    for c2 in range(V):
        want = cp.host_reference_prefix_logp(xn, [c1, c2])
        np.testing.assert_allclose(float(psi2[0, c2]), want, rtol=1e-4)
        np.testing.assert_allclose(float(psi_delta2[0, c2]),
                                   want - float(psi1[0]), rtol=1e-4)


def test_forward_variables_sum_to_sequence_prob(x):
    """After consuming prefix [c], logaddexp(r_nb[T-1], r_b[T-1]) must be
    the probability that the output is EXACTLY [c]."""
    _, r_all, _ = first_step(x)
    xn = np.asarray(x, np.float64)
    for c in range(V):
        r_last = r_all[0, c, -1]
        got = float(jnp.logaddexp(r_last[0], r_last[1]))
        # P(output == [c]) = P(prefix [c]) - sum_c2 P(prefix [c, c2])
        want = cp.host_reference_prefix_logp(xn, [c])
        tail = -np.inf
        for c2 in range(V):
            tail = np.logaddexp(tail,
                                cp.host_reference_prefix_logp(xn, [c, c2]))
        want = np.log(np.maximum(np.exp(want) - np.exp(tail), 1e-300))
        np.testing.assert_allclose(got, want, rtol=1e-3)


def test_length_masking_equals_truncation(x):
    """Masked frames beyond enc_len must reproduce scoring on the
    truncated input exactly."""
    enc_len = 3
    xm = cp.masked_logp(x, jnp.array(enc_len))
    psi_m, _, _ = first_step(xm)
    xn = np.asarray(x, np.float64)[:enc_len]
    for c in range(V):
        want = cp.host_reference_prefix_logp(xn, [c])
        np.testing.assert_allclose(float(psi_m[0, c]), want, rtol=1e-4)
