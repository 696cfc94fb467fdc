"""Listen, Attend and Spell — pure-functional JAX model.

Re-designs the reference's TF1 graph (las/las.py, las/layers.py) as
params-pytree + apply functions:

- Listener: 'cnn' = 2x stride-2 conv (time/4, feat/4) + N x {BiRNN ->
  proj -> BN -> ReLU} (las/layers.py:118-163, including the double-BN
  quirk at :158-161); 'pblstm' = BiRNN + tanh proj + pyramid stages that
  concat even/odd timesteps (LAS eq. 5; las/layers.py:56-95 — the
  reference's call site is broken, this one works).
- Speller: embedding (uniform +-1, optional variational noise), stacked
  vanilla-RNN cells, additive/location-aware attention, output dense —
  unrolled with ONE lax.scan carrying (states, prev_emb, prev_align)
  instead of the reference's tf.while_loop (las/las.py:92-141).
- Scheduled sampling: per-step batch-level coin flip between teacher
  forcing and sampling from the predicted distribution
  (las/las.py:100-109), with the linear tf-rate decay of
  las/las.py:177-183.
- Losses: masked label-smoothed CE (eps 0.01; las/las.py:320-333,
  las/utils.py:5-12), optional CTC (blank = vocab_size, matching
  tf.nn.ctc_loss; las/las.py:335-349 — without the reference's [:-1]
  sparse-index off-by-one).
- LR schedule: lr * 0.5^(max(step-50k,0)/100k) floored at 0.01*lr
  (las/las.py:351-369).

All shapes static under jit: dec_steps is the padded label length for
training and a convert_rate-derived bound for inference; loss masking
makes the extra steps numerically irrelevant.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import attention as att
from ..ops import layers as L


def ceil_half(x):
    """(x + x % 2) / 2 — the reference's length reduction
    (las/layers.py:94, :135-136)."""
    return (x + x % 2) // 2


def enc_out_dim(cfg: Config) -> int:
    """True Listener output dim: cnn -> enc_units (dense proj,
    las/layers.py:154-157); pblstm -> 2*enc_units (las/layers.py:71-74)."""
    return cfg.enc_units if cfg.enc_type == "cnn" else 2 * cfg.enc_units


# ===========================================================================
# Listener
# ===========================================================================

def listener_init(key, cfg: Config) -> Tuple[Dict, Dict]:
    params: Dict = {}
    state: Dict = {}
    keys = jax.random.split(key, 4 + 2 * cfg.num_enc_layers)
    if cfg.enc_type == "cnn":
        params["conv0"] = L.conv2d_init(keys[0], 3, cfg.num_enc_channels)
        params["conv1"] = L.conv2d_init(keys[1], cfg.num_enc_channels,
                                        cfg.num_enc_channels)
        if cfg.apply_bn:
            params["bn_conv0"], state["bn_conv0"] = L.bn_init(cfg.num_enc_channels)
            params["bn_conv1"], state["bn_conv1"] = L.bn_init(cfg.num_enc_channels)
        d = ceil_half(ceil_half(cfg.feat_dim)) * cfg.num_enc_channels
        for i in range(cfg.num_enc_layers):
            lp: Dict = {}
            ls: Dict = {}
            lp["birnn"] = L.birnn_init(keys[2 + 2 * i], d, cfg.enc_units)
            lp["proj"] = L.dense_init(keys[3 + 2 * i], 2 * cfg.enc_units,
                                      cfg.enc_units)
            if cfg.apply_bn:  # optional extra BN (las/layers.py:158-159)
                lp["bn_extra"], ls["bn_extra"] = L.bn_init(cfg.enc_units)
            # unconditional BN inside relu(bn(...)) (las/layers.py:161)
            lp["bn_main"], ls["bn_main"] = L.bn_init(cfg.enc_units)
            params[f"layer_{i}"] = lp
            state[f"layer_{i}"] = ls
            d = cfg.enc_units
    elif cfg.enc_type == "pblstm":
        d = cfg.feat_dim * 3
        params["birnn0"] = L.birnn_init(keys[0], d, cfg.enc_units)
        params["proj0"] = L.dense_init(keys[1], 2 * cfg.enc_units,
                                       2 * cfg.enc_units)
        for i in range(cfg.num_enc_layers):
            params[f"pyr_{i}"] = {
                "birnn": L.birnn_init(keys[2 + 2 * i], 2 * cfg.enc_units,
                                      cfg.enc_units),
                "proj": L.dense_init(keys[3 + 2 * i], 4 * cfg.enc_units,
                                     2 * cfg.enc_units),
            }
    else:
        raise NotImplementedError(cfg.enc_type)
    return params, state


def _cnn_listener(params, state, audio, audiolen, cfg, is_training, drop_key):
    x = audio  # (B, T, D, 3) == NHWC with 3 input channels
    new_state: Dict = {}
    for i in (0, 1):
        x = L.conv2d_apply(params[f"conv{i}"], x, stride=2)
        if cfg.apply_bn:
            x, new_state[f"bn_conv{i}"] = L.bn_apply(
                params[f"bn_conv{i}"], state[f"bn_conv{i}"], x, is_training)
        x = jax.nn.relu(x)
        audiolen = ceil_half(audiolen)
    B, T, Dr, C = x.shape
    x = x.reshape(B, T, Dr * C)
    for i in range(cfg.num_enc_layers):
        lp, ls = params[f"layer_{i}"], state[f"layer_{i}"]
        nls: Dict = {}
        if drop_key is not None:
            drop_key, sub = jax.random.split(drop_key)
            x = L.dropout(sub, x, cfg.dropout_rate, is_training)
        x, _ = L.birnn_apply(lp["birnn"], x, unroll=cfg.scan_unroll)
        x = L.dense_apply(lp["proj"], x)
        if cfg.apply_bn:
            x, nls["bn_extra"] = L.bn_apply(lp["bn_extra"], ls["bn_extra"],
                                            x, is_training)
        x, nls["bn_main"] = L.bn_apply(lp["bn_main"], ls["bn_main"],
                                       x, is_training)
        x = jax.nn.relu(x)
        new_state[f"layer_{i}"] = nls
    return x, audiolen, new_state


def _pblstm_listener(params, state, audio, audiolen, cfg, is_training, drop_key):
    B, T, D, C = audio.shape
    x = audio.reshape(B, T, D * C)  # (B,T,D*3) (las/las.py:14)
    if drop_key is not None:
        drop_key, sub = jax.random.split(drop_key)
        x = L.dropout(sub, x, cfg.dropout_rate, is_training)
    x, _ = L.birnn_apply(params["birnn0"], x, unroll=cfg.scan_unroll)
    x = jnp.tanh(L.dense_apply(params["proj0"], x))
    for i in range(cfg.num_enc_layers):
        lp = params[f"pyr_{i}"]
        if drop_key is not None:
            drop_key, sub = jax.random.split(drop_key)
            x = L.dropout(sub, x, cfg.dropout_rate, is_training)
        x, _ = L.birnn_apply(lp["birnn"], x, unroll=cfg.scan_unroll)
        t = x.shape[1]
        if t % 2:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        even, odd = x[:, ::2, :], x[:, 1::2, :]
        x = jnp.concatenate([even, odd], -1)  # (B, ceil(T/2), 4u) LAS eq. 5
        x = jnp.tanh(L.dense_apply(lp["proj"], x))
        audiolen = ceil_half(audiolen)
    return x, audiolen, state


def listener_apply(params, state, audio, audiolen, cfg: Config,
                   is_training: bool = True, drop_key=None):
    """(B,T,D,3) -> (enc_out (B,T',H), enc_len (B,), new_bn_state)."""
    if cfg.enc_type == "cnn":
        return _cnn_listener(params, state, audio, audiolen, cfg,
                             is_training, drop_key)
    return _pblstm_listener(params, state, audio, audiolen, cfg,
                            is_training, drop_key)


# ===========================================================================
# Speller
# ===========================================================================

def speller_init(key, cfg: Config) -> Dict:
    h_dim = enc_out_dim(cfg)
    s_dim = cfg.dec_units * cfg.num_dec_layers
    keys = jax.random.split(key, 4 + cfg.num_dec_layers)
    params: Dict = {
        "embedding": L.embedding_init(keys[0], cfg.vocab_size,
                                      cfg.embedding_size),
        "attention": att.attention_init(keys[1], cfg.mode, h_dim, s_dim,
                                        cfg.attention_size,
                                        cfg.loc_kernel_size,
                                        cfg.loc_num_channels),
        "out": L.dense_init(keys[2], cfg.dec_units, cfg.vocab_size),
    }
    in_dim = cfg.embedding_size + h_dim
    for l in range(cfg.num_dec_layers):
        params[f"cell_{l}"] = L.rnn_cell_init(keys[3 + l], in_dim, cfg.dec_units)
        in_dim = cfg.dec_units
    if cfg.ctc:
        params["ctc_head"] = L.dense_init(keys[-1], h_dim, cfg.vocab_size + 1)
    return params


def decode_step(params, cfg: Config, enc_out, enc_len, states, prev_emb,
                prev_align, h_proj=None, loc_proj=None):
    """One decoder step (reference: Speller.decode, las/las.py:145-160).

    states: (L, B, U).  Attention query = concat of ALL layer states
    (las/las.py:185-189).  h_proj: optional precomputed enc_out @ W_h;
    loc_proj: optional precomputed location-conv Toeplitz matrix
    (att.precompute_location) — both loop-invariant, hoisted by callers.
    """
    B = enc_out.shape[0]
    s_i = jnp.transpose(states, (1, 0, 2)).reshape(B, -1)
    context, alphas = att.attention_apply(
        params["attention"], cfg.mode, enc_out, s_i, prev_align, enc_len,
        h_proj, loc_proj)
    x = jnp.concatenate([prev_emb, context], -1)
    new_states = []
    for l in range(cfg.num_dec_layers):
        h = L.rnn_cell_apply(params[f"cell_{l}"], x, states[l])
        new_states.append(h)
        x = h
    logits = L.dense_apply(params["out"], x)
    return logits, jnp.stack(new_states), alphas


def scheduled_sampling_rate(cfg: Config, step) -> jnp.ndarray:
    """Linear decay 1.0 -> min_rate between warmup and max step
    (reference: las/las.py:177-183)."""
    if cfg.max_step <= cfg.warmup_step:
        # a negative decay window silently INVERTS the schedule (min_rate
        # at step 0 rising back to 1.0) — refuse loudly instead
        raise ValueError(
            f"scheduled sampling needs max_step > warmup_step, got "
            f"warmup_step={cfg.warmup_step} max_step={cfg.max_step}")
    step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
    progress = jnp.minimum(
        (step - cfg.warmup_step) / float(cfg.max_step - cfg.warmup_step), 1.0)
    return jnp.minimum(1.0, 1.0 - progress * (1.0 - cfg.min_rate))


def speller_apply(params, cfg: Config, enc_out, enc_len, dec_steps: int,
                  teacher: Optional[jnp.ndarray] = None,
                  is_training: bool = True, rng: Optional[jax.Array] = None,
                  tf_rate=1.0):
    """Run the decoder for dec_steps (static).  Returns (logits, alphas).

    Training: batch-level coin per step chooses teacher forcing vs a
    sample from the current distribution (las/las.py:100-109).
    Inference: greedy argmax feedback (las/las.py:110-111).
    """
    B, T_enc, _ = enc_out.shape
    sos = jnp.ones((B,), jnp.int32)  # <SOS> id 1 (las/las.py:81)
    # static knowledge of which RNG consumers exist keeps the scan body
    # free of unused threefry calls (pure teacher forcing needs none)
    sampling = is_training and not (isinstance(tf_rate, float)
                                    and tf_rate >= 1.0)
    needs_rng = is_training and (sampling or cfg.dropout_rate > 0
                                 or cfg.add_vn)
    if rng is None:
        if needs_rng:
            # a constant key would silently reuse the same dropout masks /
            # sampling coins every optimization step — fail fast instead
            raise ValueError(
                "speller_apply: rng is required when training with "
                "scheduled sampling, dropout, or variational noise")
        rng = jax.random.PRNGKey(0)

    def lookup(ids, key):
        vn_key = None
        if cfg.add_vn and is_training:
            key, vn_key = jax.random.split(key)
        return L.embedding_lookup(params["embedding"], ids, vn_key), key

    emb0, rng = lookup(sos, rng)
    init = (
        jnp.zeros((cfg.num_dec_layers, B, cfg.dec_units), enc_out.dtype),
        emb0,
        jnp.zeros((B, T_enc), enc_out.dtype),
        rng,
    )
    teacher_t = (jnp.swapaxes(teacher, 0, 1) if teacher is not None
                 else jnp.zeros((dec_steps, B), jnp.int32))

    h_proj = att.precompute_hidden(params["attention"], enc_out)
    loc_proj = (att.precompute_location(params["attention"], T_enc)
                if cfg.mode == "loc" else None)

    def step(carry, y_t):
        states, prev_emb, prev_align, key = carry
        logits, states, alphas = decode_step(
            params, cfg, enc_out, enc_len, states, prev_emb, prev_align,
            h_proj, loc_proj)
        if needs_rng:
            key, k_coin, k_samp, k_drop, k_vn = jax.random.split(key, 5)
        else:
            k_coin = k_samp = k_drop = k_vn = None
        if is_training:
            if sampling:
                use_teacher = tf_rate > jax.random.uniform(k_coin, ())
                sampled = jax.random.categorical(k_samp, logits, axis=-1)
                ids = jnp.where(use_teacher, y_t, sampled)
            else:  # scheduled sampling off: always teacher-force
                ids = y_t
            emb, _ = lookup(ids, k_vn)
            emb = L.dropout(k_drop, emb, cfg.dropout_rate, is_training)
        else:
            emb, _ = lookup(jnp.argmax(logits, -1), k_vn)
        return (states, emb, alphas, key), (logits, alphas)

    body = jax.checkpoint(step) if cfg.remat else step
    _, (logits, alphas) = jax.lax.scan(body, init, teacher_t,
                                       length=dec_steps,
                                       unroll=cfg.scan_unroll)
    return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(alphas, 0, 1)


# ===========================================================================
# LAS facade: init / forward / losses
# ===========================================================================

def las_init(key, cfg: Config) -> Tuple[Dict, Dict]:
    kl, ks = jax.random.split(key)
    lp, lstate = listener_init(kl, cfg)
    sp = speller_init(ks, cfg)
    return {"listener": lp, "speller": sp}, {"listener": lstate}


def compute_cast(cfg: Config, params, audio):
    """Mixed precision: bfloat16 compute, float32 master weights.

    cfg.dtype == 'bfloat16' casts parameters and activations entering the
    forward; losses and optimizer state stay float32.  bf16 doubles MXU
    throughput and halves HBM traffic on TPU."""
    if cfg.dtype != "bfloat16":
        return params, audio
    cast = lambda x: (x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x)

    # int8 dequant scales (ops/quant.py 'w_scale' leaves) stay float32:
    # downcasting them to bf16 would stack ~0.4% scale rounding on the
    # documented ~0.8% int8 quantization error; dequant_matmul casts to
    # the activation dtype at the point of use.
    def cast_tree(t):
        if isinstance(t, dict):
            return {k: (v if k == "w_scale" else cast_tree(v))
                    for k, v in t.items()}
        return jax.tree_util.tree_map(cast, t)

    return cast_tree(params), audio.astype(jnp.bfloat16)


def las_forward(params, state, audio, audiolen, cfg: Config, dec_steps: int,
                teacher=None, is_training=True, rng=None, tf_rate=1.0):
    """Full encoder-decoder forward.  Returns
    (logits, ctc_logits, alphas, enc_len, new_state); logits/alphas float32
    regardless of compute dtype."""
    params, audio = compute_cast(cfg, params, audio)
    drop_key = None
    if rng is not None and is_training:
        rng, drop_key = jax.random.split(rng)
    enc_out, enc_len, new_lstate = listener_apply(
        params["listener"], state["listener"], audio, audiolen, cfg,
        is_training, drop_key)
    ctc_logits = None
    if cfg.ctc:
        ctc_logits = L.dense_apply(params["speller"]["ctc_head"], enc_out)
    logits, alphas = speller_apply(
        params["speller"], cfg, enc_out, enc_len, dec_steps, teacher,
        is_training, rng, tf_rate)
    logits = logits.astype(jnp.float32)
    alphas = alphas.astype(jnp.float32)
    if ctc_logits is not None:
        ctc_logits = ctc_logits.astype(jnp.float32)
    return logits, ctc_logits, alphas, enc_len, {"listener": new_lstate}


def label_smoothing(one_hot: jnp.ndarray, epsilon: float = 0.01) -> jnp.ndarray:
    """(1-eps)*y + eps/K (reference: las/utils.py:5-12)."""
    K = one_hot.shape[-1]
    return (1.0 - epsilon) * one_hot + epsilon / K


def attention_loss(logits, y, cfg: Config) -> jnp.ndarray:
    """Masked label-smoothed CE over non-PAD positions
    (reference: las/las.py:320-333)."""
    T = logits.shape[1]
    y = y[:, :T]
    y_ = jax.nn.one_hot(y, cfg.vocab_size)
    if cfg.label_smoothing:
        y_ = label_smoothing(y_)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(y_ * logp, axis=-1)
    mask = 1.0 - (y == 0).astype(jnp.float32)
    return jnp.sum(ce * mask) / (jnp.sum(mask) + 1e-9)


def ctc_loss(ctc_logits, y, enc_len, cfg: Config) -> jnp.ndarray:
    """CTC over encoder frames; blank id = vocab_size, matching
    tf.nn.ctc_loss's num_classes-1 blank (reference: las/las.py:335-349).

    cfg.ctc_compat_drop_last reproduces the reference's sparse-conversion
    off-by-one: `tf.where(not_equal(labels,0))[:-1]` (las/las.py:338)
    silently removes the batch's final non-PAD label (row-major order,
    i.e. the last utterance's trailing token, usually its <EOS>)."""
    import optax
    B, T, _ = ctc_logits.shape
    if cfg.ctc_compat_drop_last:
        flat = y.reshape(-1)
        pos = jnp.where(flat != 0, jnp.arange(flat.size), -1)
        last = jnp.max(pos)  # -1 when the batch is all PAD
        y = jnp.where(jnp.arange(flat.size) == last, 0, flat).reshape(y.shape)
    logit_pad = 1.0 - L.length_mask(enc_len, T)
    label_pad = (y == 0).astype(jnp.float32)
    per_seq = optax.ctc_loss(ctc_logits, logit_pad, y, label_pad,
                             blank_id=cfg.vocab_size)
    return jnp.mean(per_seq)


def total_loss(params, state, batch, cfg: Config, dec_steps, rng, step):
    """Training loss closure for jax.grad."""
    audio, audiolen, y, tokenlen = batch
    if cfg.spec_augment:
        from ..ops.augmentation import spec_augment
        rng, sa_key = jax.random.split(rng)
        audio = spec_augment(sa_key, audio, audiolen, cfg)
    tf_rate = (scheduled_sampling_rate(cfg, step)
               if cfg.scheduled_sampling else 1.0)
    logits, ctc_logits, alphas, enc_len, new_state = las_forward(
        params, state, audio, audiolen, cfg, dec_steps, teacher=y,
        is_training=True, rng=rng, tf_rate=tf_rate)
    loss = attention_loss(logits, y, cfg)
    if cfg.ctc:
        loss = loss + cfg.ctc_weight * ctc_loss(ctc_logits, y, enc_len, cfg)
    return loss, (logits, alphas, new_state)


def scheduled_learning_rate(cfg: Config, step):
    """Exponential decay with floor (reference: las/las.py:351-369).

    The reference hardcodes start=50k / decay_step=100k / rate=0.5 /
    floor=0.01*lr; here they are config fields (same defaults) so short
    training budgets can use a real schedule."""
    step = jnp.asarray(step, jnp.float32)
    decayed = cfg.lr * cfg.lr_decay_rate ** (
        jnp.maximum(step - cfg.lr_decay_start, 0.0) / cfg.lr_decay_step)
    return jnp.maximum(decayed, cfg.lr_min_ratio * cfg.lr)


def num_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
