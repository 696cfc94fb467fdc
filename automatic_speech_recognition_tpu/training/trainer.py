"""Training step: Adam + global-norm clipping + scheduled LR, as one jitted
(and mesh-shardable) program.

Reference semantics (las/las.py:265-283): AdamOptimizer on the decayed LR
(start 50k, half-life 100k, floor 0.01*lr), clip_by_global_norm(grad_clip),
global step incremented per application.  BN moving stats update alongside
(the reference's UPDATE_OPS control dependency).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import las


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # Under MultiSteps the inner optimizer's count increments once per
    # grad_accum_steps micro-steps, while ts.step (what train.py logs and
    # the sampling schedule consume) increments every micro-step.  Scale
    # the schedule's argument back to micro-steps so the LR actually
    # applied matches the logged scheduled_learning_rate(cfg, ts.step)
    # and keeps the reference's step semantics (las/las.py:351-369).
    accum = max(cfg.grad_accum_steps, 1)
    schedule = lambda count: las.scheduled_learning_rate(cfg, count * accum)
    tx = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip > 0 else []
    tx.append(optax.adam(schedule))
    opt = optax.chain(*tx)
    if cfg.grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum_steps)
    return opt


def create_train_state(key, cfg: Config) -> TrainState:
    params, bn_state = las.las_init(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params, bn_state, opt_state,
                      jnp.zeros((), jnp.int32), jax.random.PRNGKey(cfg.seed))


def _apply_update(ts: TrainState, batch, cfg: Config, dec_steps: int):
    """Shared fwd+bwd+optimizer core used by every train-step flavor.
    Returns (new_ts, loss, logits, alphas, grads)."""
    if cfg.audio_shards:
        # raw-waveform batches: augmentation and the frontend run here,
        # inside the same jitted program as fwd+bwd — features never
        # cross the host boundary or touch disk
        # (ops/frontend.py, ops/augmentation.py)
        from ..ops import augmentation, frontend
        sig, siglen = batch[0], batch[1]
        if sig.ndim == 4:
            sig = sig[:, :, 0, 0]
        if cfg.online_speed_perturb:
            # independent of the split() stream below so augmentation
            # does not shift dropout/sampling RNG vs a non-augmented run
            aug_rng = jax.random.fold_in(ts.rng, 0x5eed)
            sig, siglen = augmentation.online_speed_perturb(
                aug_rng, sig, siglen, cfg)
        if cfg.online_volume_perturb:
            vol_rng = jax.random.fold_in(ts.rng, 0x701)
            sig = augmentation.online_volume_perturb(vol_rng, sig, cfg)
        if cfg.online_noise_perturb:
            noise_rng = jax.random.fold_in(ts.rng, 0x9015)
            sig = augmentation.online_noise_perturb(noise_rng, sig,
                                                    siglen, cfg)
        feat, featlen = frontend.featurize_batch(sig, siglen, cfg)
        batch = (feat, featlen, batch[2], batch[3])
    rng, step_rng = jax.random.split(ts.rng)
    grad_fn = jax.value_and_grad(las.total_loss, has_aux=True)
    (loss, (logits, alphas, new_bn)), grads = grad_fn(
        ts.params, ts.bn_state, batch, cfg, dec_steps, step_rng, ts.step)
    tx = make_optimizer(cfg)
    updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)
    new_ts = TrainState(new_params, new_bn, new_opt, ts.step + 1, rng)
    return new_ts, loss, logits, alphas, grads


def _att_peak(alphas, tokenlen):
    """Mean max attention weight over valid decoder steps: ~1/T_enc while
    attention is diffuse, -> 1.0 once it locks.  A one-scalar version of
    the alignment-image check the reference tells users to watch in
    TensorBoard to verify learning (README.md:40); the 12k-corpus study
    (benchmarks/WER_SYNTH.md) shows WER tracks this transition."""
    steps = jnp.arange(alphas.shape[1])[None, :]
    mask = (steps < tokenlen[:, None]).astype(alphas.dtype)
    peak = jnp.max(alphas, axis=-1)  # (B, S); padded enc positions are ~0
    return jnp.sum(peak * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _full_metrics(cfg, step, loss, logits, alphas, grads, tokenlen):
    return {
        "loss": loss,
        "lr": las.scheduled_learning_rate(cfg, step),
        "tf_rate": (las.scheduled_sampling_rate(cfg, step)
                    if cfg.scheduled_sampling else jnp.array(1.0)),
        "grad_norm": optax.global_norm(grads),
        "att_peak": _att_peak(alphas, tokenlen),
        "sample_ids": jnp.argmax(logits[0], -1),
        "sample_alphas": alphas[0],
    }


@functools.partial(jax.jit, static_argnames=("cfg", "dec_steps"),
                   donate_argnames=("ts",))
def train_step(ts: TrainState, batch, cfg: Config, dec_steps: int):
    """One optimization step.  batch = (audio, audiolen, y, tokenlen).

    Returns (new_state, metrics) where metrics carries loss / lr / tf_rate
    and a decoded sample for logging (reference logs these,
    train.py:114-126).
    """
    new_ts, loss, logits, alphas, grads = _apply_update(ts, batch, cfg,
                                                        dec_steps)
    return new_ts, _full_metrics(cfg, ts.step, loss, logits, alphas, grads,
                                 batch[3])


@functools.partial(jax.jit, static_argnames=("cfg", "dec_steps"),
                   donate_argnames=("ts",))
def train_multi_step(ts: TrainState, batches, cfg: Config, dec_steps: int):
    """Run K optimization steps in ONE dispatch via lax.scan.

    batches: pytree of arrays with a leading (K, ...) axis (K stacked
    batches of one bucket shape).  Amortizes per-dispatch overhead — on
    tunneled dev platforms the host round-trips the TrainState between
    chained dispatches (measured 2.3 s/step vs 15 ms of real compute), and
    on any platform it removes K-1 dispatches.  Returns the final state
    and the full per-step metrics dict (leading K axis on every value) —
    the same lr/tf_rate/grad_norm/sample fields as single-step, so
    multi-step dispatch loses no observability (reference logs these
    every step, train.py:114-126).
    """
    def one(ts, batch):
        new_ts, loss, logits, alphas, grads = _apply_update(ts, batch, cfg,
                                                            dec_steps)
        return new_ts, _full_metrics(cfg, ts.step, loss, logits, alphas,
                                     grads, batch[3])

    ts, metrics = jax.lax.scan(one, ts, batches)
    return ts, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "dec_steps"))
def eval_forward(params, bn_state, audio, audiolen, cfg: Config,
                 dec_steps: int):
    """Greedy inference forward (reference: las/las.py:306-318).
    Returns (logits, y_hat)."""
    logits, _, alphas, enc_len, _ = las.las_forward(
        params, bn_state, audio, audiolen, cfg, dec_steps,
        teacher=None, is_training=False)
    y_hat = jnp.argmax(logits, -1)
    if cfg.greedy_eos_margin >= 0:
        # greedy end detection: cut at the first step where EOS scores
        # within the margin of the best CONTENT token (PAD/SOS excluded
        # like beam.py's end detection: neither is ever a training
        # target, so their unconstrained logits are phantom
        # competitors).  Detokenization cuts at the first EOS, so
        # marking every qualifying step is equivalent to cutting at the
        # first one; steps before it are untouched (argmax parity).
        # The logit difference equals the log-prob difference (softmax
        # shift invariance), so raw logits are compared directly.
        eos = logits[..., 2]
        best_other = jnp.max(
            logits.at[..., :3].set(-jnp.inf), axis=-1)
        y_hat = jnp.where(eos >= best_other - cfg.greedy_eos_margin,
                          2, y_hat)
    return logits, y_hat


def make_mesh_train_step(mesh, ts: TrainState, batch, cfg: Config):
    """Compile train_step as ONE SPMD program over a ('data','model') mesh.

    Params/opt-state are sharded by the tensor-parallel rule
    (parallel/sharding.py), the batch along 'data'; GSPMD propagates
    activation shardings and inserts the gradient psum over ICI — the
    TPU-native replacement for the reference's single hardcoded GPU
    (train.py:23).  Returns (jitted_step, sharded_state, shard_batch_fn).

    dec_steps is taken from the batch's (static) token width at trace
    time, so per-bucket token padding runs ~max(tokenlen) decoder steps
    like the reference (las/las.py:246-249); each distinct bucket shape
    compiles once.
    """
    from ..parallel import sharding as sh

    state_sh = sh.state_shardings(mesh, ts, cfg.model_axis)
    batch_sh = sh.batch_shardings(mesh, tuple(batch), cfg.data_axis)

    def step_fn(ts, batch):
        dec_steps = batch[2].shape[1]  # static under jit
        new_ts, loss, logits, alphas, grads = _apply_update(ts, batch, cfg,
                                                            dec_steps)
        return new_ts, _full_metrics(cfg, ts.step, loss, logits, alphas,
                                     grads, batch[3])

    jitted = jax.jit(step_fn, in_shardings=(state_sh, batch_sh),
                     out_shardings=(state_sh, None),
                     donate_argnums=(0,))
    if jax.process_count() > 1:
        # Multi-host: the state is identical on every process (same init
        # seed / same restored checkpoint), so each process materializes
        # its addressable shards from its local copy; batches arrive as
        # per-process row slices (BucketedLoader part_index/part_count)
        # and are stitched into global arrays along the 'data' axis.
        sharded_ts = jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_callback(
                np.shape(x), s, lambda idx, _x=x: np.asarray(_x)[idx]),
            ts, state_sh)

        def shard_batch(b):
            return tuple(
                jax.make_array_from_process_local_data(s, np.asarray(x))
                for s, x in zip(batch_sh, b))
    else:
        sharded_ts = jax.tree_util.tree_map(jax.device_put, ts, state_sh)

        def shard_batch(b):
            return jax.tree_util.tree_map(jax.device_put, tuple(b),
                                          batch_sh)

    return jitted, sharded_ts, shard_batch
