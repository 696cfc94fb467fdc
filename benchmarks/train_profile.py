"""Train-step cost decomposition with DEVICE-time resolution (run
manually on TPU).

Attributes the published-size train step (reference recipe model,
run.sh:59-76) to its phases via K-amplified ablation arms, the same
methodology as decoder_profile.py / bench.py (per-dispatch wall timing
cannot resolve <25 ms programs through the tunnel — RESULTS.md
"Dispatch floor"):

  full      fwd + bwd + optimizer (the production train_multi_step body)
  no_opt    fwd + bwd only                  -> optimizer = full - no_opt
  fwd       forward loss only               -> backward  = no_opt - fwd
  enc_fwd   listener + CTC head forward     -> decoder fwd = fwd - enc_fwd
  no_ctc    full without the CTC head/loss  -> CTC cost  = full - no_ctc
  add_att   full with additive attention    -> location-att train cost

Each arm runs K times inside ONE jitted program: the train arms scan
_apply_update with donated state (exactly train_multi_step's body, so
the measured program IS the production program); the forward arms chain
a scalar carry through the loss.  Reported per-step time is
(t_K - t_1)/(K - 1), min over paired reps (the tunneled chip is
time-shared; contention is strictly additive).

Usage: python benchmarks/train_profile.py [--quick] [--batch 32]
       [--enc_T 512] [--tokens 60] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.config import Config
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.utils.kamp import reduce_dts


def timed(fn, n=3):
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def make_cfg(args, mode="loc", ctc=True):
    return Config(
        unit="char", vocab_size=30, feat_dim=13, enc_type="cnn",
        enc_units=args.enc_units, num_enc_layers=4, num_enc_channels=32,
        dec_units=args.dec_units, num_dec_layers=2,
        embedding_size=256, attention_size=128,
        mode=mode, ctc=ctc, ctc_weight=0.2, dtype=args.dtype,
        scheduled_sampling=False, scan_unroll=4)


def make_batch(args, rng):
    B, T, L = args.batch, args.enc_T, args.tokens
    feat = (rng.standard_normal((B, T, 13, 3)) * 0.5).astype(np.float32)
    featlen = np.full((B,), T, np.int32)
    y = rng.integers(3, 30, size=(B, L)).astype(np.int32)
    y[:, -1] = 2
    tokenlen = np.full((B,), L, np.int32)
    return tuple(jnp.asarray(a) for a in (feat, featlen, y, tokenlen))


def measure_train(cfg, batch, dec_steps, K, reps, seed=0):
    """Per-step device time of the production multi-step body."""
    def make(k):
        ts = trainer.create_train_state(jax.random.PRNGKey(seed), cfg)
        batches = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), batch)
        fn = jax.jit(
            lambda s, b: trainer.train_multi_step(s, b, cfg, dec_steps))
        def run():
            new_ts, m = fn(ts, batches)
            return m["loss"][-1]
        return run
    f1, fK = make(1), make(K)
    float(jax.device_get(f1())); float(jax.device_get(fK()))  # compile
    dts = []
    for _ in range(reps):
        t1, tK = timed(f1), timed(fK)
        dts.append((tK - t1) / (K - 1))
    return reduce_dts(dts, what="train_profile")[0]


def measure_fwd(cfg, batch, dec_steps, K, reps, grad=False, enc_only=False,
                seed=0):
    """Forward (or fwd+bwd, no optimizer) loss, K-amplified via a scalar
    carry folded into the audio so iterations are data-dependent."""
    ts = trainer.create_train_state(jax.random.PRNGKey(seed), cfg)
    params, state = ts.params, ts.bn_state
    rng = jax.random.PRNGKey(1)

    def loss_fn(p, audio):
        if enc_only:
            # listener + CTC head only: what the encoder costs without
            # the attention/decoder scan
            from automatic_speech_recognition_tpu.ops import layers as L
            p2, audio2 = las.compute_cast(cfg, p, audio)
            hidden, enc_len, _ = las.listener_apply(
                p2["listener"], state["listener"], audio2, batch[1], cfg,
                is_training=True)
            ctc_logits = L.dense_apply(p2["speller"]["ctc_head"], hidden)
            return jnp.sum(ctc_logits[:, 0, 0].astype(jnp.float32))
        b = (audio, batch[1], batch[2], batch[3])
        loss, _ = las.total_loss(p, state, b, cfg, dec_steps, rng, 0)
        return loss

    body = (jax.grad(loss_fn) if grad else loss_fn)

    def make(k):
        @jax.jit
        def f(p, audio):
            def it(i, acc):
                out = body(p, audio + acc * 1e-30)
                if grad:
                    out = jax.tree_util.tree_reduce(
                        lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                        out, jnp.float32(0))
                return acc + out.astype(jnp.float32)
            return jax.lax.fori_loop(0, k, it, jnp.float32(0))
        return lambda: f(params, batch[0])
    f1, fK = make(1), make(K)
    float(jax.device_get(f1())); float(jax.device_get(fK()))
    dts = []
    for _ in range(reps):
        t1, tK = timed(f1), timed(fK)
        dts.append((tK - t1) / (K - 1))
    return reduce_dts(dts, what="train_profile")[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--enc_T", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=60)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--enc_units", type=int, default=512)
    ap.add_argument("--dec_units", type=int, default=1024)
    ap.add_argument("--k_amp", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.k_amp, args.reps = 4, 2

    rng = np.random.default_rng(0)
    batch = make_batch(args, rng)
    dec_steps = args.tokens
    K, R = args.k_amp, args.reps

    cfg = make_cfg(args)
    print(f"train-step decomposition: B={args.batch} T={args.enc_T} "
          f"L={args.tokens} dtype={args.dtype} published size "
          f"(K={K}, min of {R} paired reps)", flush=True)

    r = {}
    r["full"] = measure_train(cfg, batch, dec_steps, K, R)
    print(f"  full     {r['full']*1e3:7.2f} ms/step", flush=True)
    r["no_ctc"] = measure_train(make_cfg(args, ctc=False), batch,
                                dec_steps, K, R)
    print(f"  no_ctc   {r['no_ctc']*1e3:7.2f} ms/step", flush=True)
    r["add_att"] = measure_train(make_cfg(args, mode="add"), batch,
                                 dec_steps, K, R)
    print(f"  add_att  {r['add_att']*1e3:7.2f} ms/step", flush=True)
    r["no_opt"] = measure_fwd(cfg, batch, dec_steps, K, R, grad=True)
    print(f"  no_opt   {r['no_opt']*1e3:7.2f} ms/step (fwd+bwd)", flush=True)
    r["fwd"] = measure_fwd(cfg, batch, dec_steps, K, R)
    print(f"  fwd      {r['fwd']*1e3:7.2f} ms/step", flush=True)
    r["enc_fwd"] = measure_fwd(cfg, batch, dec_steps, K, R, enc_only=True)
    print(f"  enc_fwd  {r['enc_fwd']*1e3:7.2f} ms/step", flush=True)

    print("derived attribution:")
    print(f"  optimizer        {1e3*(r['full'] - r['no_opt']):7.2f} ms")
    print(f"  backward         {1e3*(r['no_opt'] - r['fwd']):7.2f} ms")
    print(f"  decoder fwd      {1e3*(r['fwd'] - r['enc_fwd']):7.2f} ms")
    print(f"  encoder+ctc fwd  {1e3*r['enc_fwd']:7.2f} ms")
    print(f"  ctc head+loss    {1e3*(r['full'] - r['no_ctc']):7.2f} ms")
    print(f"  loc att vs add   {1e3*(r['full'] - r['add_att']):7.2f} ms")
    bsz = args.batch
    print(f"  throughput: {bsz / r['full']:.0f} utt/s at full step")


if __name__ == "__main__":
    main()
