"""Int8 weight-only quantization for the decoder's inference path.

Why this exists (TPU roofline, benchmarks/RESULTS.md "Speed-of-light"):
the greedy/beam decoder is HBM-bandwidth-bound — the speller's recurrent
+ output matrices are re-read from HBM on every one of the ~64-120
sequential decode steps, and at bf16 that weight stream IS the step
time.  Storing those matrices as int8 with a per-output-channel scale
halves the bytes the scan must move; the dequantize (convert + scale
multiply) fuses into the matmul's operand read inside the scan body, so
the HBM traffic really is int8 (validated on hardware: XLA's while-loop
LICM does not hoist the inflating int8->bf16 convert out of the loop —
see benchmarks/RESULTS.md row "int8 decoder").

Inference-only: `test.py` / `decode.py` / serving apply
`quantize_speller` to a restored float checkpoint when
`--quantize_decoder int8`; training always runs on float weights.  The
reference has no equivalent (single f32 GPU graph); this is a TPU-native
serving optimization layered on the same checkpoints.

Numerics: symmetric per-output-channel int8 (scale = max|w|/127 per
column, zero-point 0).  Per-channel keeps the quantization error
relative to each unit's own weight scale; on the published-size speller
the relative matmul error is ~3e-3 (tests/test_quantize.py), well under
bf16 activation noise at the argmax/top-K decision points.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# columns-per-channel symmetric range; -127..127 keeps the code symmetric
# (avoids the -128 asymmetry biasing the dequantized mean)
_QMAX = 127.0


def quantize_matrix(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(in_dim, out_dim) float -> {'q': int8, 'scale': f32 (out_dim,)}."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / _QMAX, 1.0)
    q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequant_matmul(x: jnp.ndarray, q: jnp.ndarray,
                   scale: jnp.ndarray) -> jnp.ndarray:
    """x @ dequant(q) with the convert kept next to the dot.

    The int8->x.dtype convert is elementwise and feeds one dot: XLA fuses
    it into the dot's operand read, so the loop-carried weight traffic is
    the int8 buffer.  The per-channel scale multiplies the (B, out)
    RESULT (cheap), not the (in, out) weight matrix — scaling the weights
    would re-inflate the fusion's live set.
    """
    y = x @ q.astype(x.dtype)
    return y * scale.astype(x.dtype)


def quantize_dense(p: Dict) -> Dict:
    """Quantize one dense/rnn-cell param dict {'w', 'b'?} in place-shape.

    Output {'w_q', 'w_scale', 'b'?} — the apply fns in ops/layers.py
    dispatch on the 'w_q' key.
    """
    out = {k: v for k, v in p.items() if k != "w"}
    qd = quantize_matrix(p["w"])
    out["w_q"] = qd["q"]
    out["w_scale"] = qd["scale"]
    return out


# output-projection matrices smaller than this are not worth quantizing:
# for char vocab (30) the out matrix is ~30 K params — noise next to the
# ~4.5 M recurrent params — and logit precision feeds beam log-probs
_OUT_QUANT_MIN_VOCAB = 512


def quantize_speller(params: Dict, vocab_size: int) -> Dict:
    """Quantize the speller's per-step weight stream for inference.

    Targets the matrices the decode scan re-reads every step: the
    recurrent cell kernels (cell_0..cell_{L-1}) and, for large vocabs
    (subword), the output projection.  Attention projections stay float:
    W_h/location are hoisted out of the scan (precompute_hidden /
    precompute_location, models/las.py:272-275), and W_s is (s_dim, A)
    — A=128 — a rounding error next to the cells.
    """
    out = dict(params)
    for name, p in params.items():
        if name.startswith("cell_"):
            out[name] = quantize_dense(p)
    if vocab_size >= _OUT_QUANT_MIN_VOCAB and "out" in params:
        out["out"] = quantize_dense(params["out"])
    return out


def quantize_model_params(params: Dict, vocab_size: int) -> Dict:
    """Top-level params {'listener', 'speller'} -> quantized speller.

    The listener is a one-shot batched forward (not a weight-streaming
    scan), so it stays float."""
    out = dict(params)
    out["speller"] = quantize_speller(params["speller"], vocab_size)
    return out


def quantize_lm(lm_params: Dict, lm_cfg) -> Dict:
    """Quantize a fusion char-RNNLM's recurrent weight stream.

    Shallow fusion runs one LM cell step per beam step (reference
    beam_search.py:109-116), so the LM's cell kernels stream from HBM
    exactly like the speller's.  'rnn'/'lstm' cells quantize (one fused
    'w'); 'gru' keeps float (two small kernels, and the reference's
    fusion recipe is lstm).  softmax_w is (units, 28) — noise — and its
    logits feed the fusion log-probs, so it stays float.
    """
    if getattr(lm_cfg, "model", "lstm") == "gru":
        return lm_params
    out = dict(lm_params)
    for name, p in lm_params.items():
        if name.startswith("cell_") and "w" in p:
            out[name] = quantize_dense(p)
    return out


def maybe_quantize_params(params: Dict, cfg) -> Dict:
    """Apply cfg.quantize_decoder to a restored float params tree.

    'none' is the identity; 'int8' quantizes the speller weight stream;
    anything else is refused loudly (a typo like 'int4' silently running
    float would misreport every benchmark downstream).
    """
    mode = getattr(cfg, "quantize_decoder", "none")
    if mode == "none":
        return params
    if mode != "int8":
        raise ValueError(
            f"--quantize_decoder must be 'none' or 'int8', got {mode!r}")
    return quantize_model_params(params, cfg.vocab_size)


def size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))
