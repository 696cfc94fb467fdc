"""Greedy batch evaluation: decode eval shards, report corpus WER
(reference driver: test.py:28-136).

Differences from the reference by design:
- inference is a single jitted program per bucket shape (no sess.run),
  dec_steps = convert_rate * padded_frames statically per bucket
  (reference: las/las.py:309-312 computes it from max(audiolen));
- batches stream through the same ARSH bucketed loader as training;
- predictions/ground truth are written to log_dir/test_pred.txt and
  log_dir/test_gt.txt, WER printed (test.py:120-136 semantics).
"""

from __future__ import annotations

import glob
import logging
import os
import sys


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import numpy as np

from automatic_speech_recognition_tpu.config import (
    apply_saved_model_config, check_model_config, parse_args)
from automatic_speech_recognition_tpu.data.pipeline import BucketedLoader
from automatic_speech_recognition_tpu.models import las
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager
from automatic_speech_recognition_tpu.utils.text import (
    convert_idx_to_string, corpus_cer, corpus_wer)
from automatic_speech_recognition_tpu.utils.tokenizer import get_tokenizer


def main(argv=None):
    cfg = parse_args(argv)
    logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    log = logging.getLogger("test")

    if cfg.use_saved_config:
        cfg, overridden = apply_saved_model_config(cfg, cfg.save_dir)
        for line in overridden:
            log.info("model flag from training snapshot: %s", line)

    # same failure model as training (docs/OPERATIONS.md): a dead tunnel
    # wedges restore / compile / eval dispatches; abort with exit 17 so a
    # supervisor can retry instead of hanging a study script forever
    from automatic_speech_recognition_tpu.utils.watchdog import StallWatchdog
    watchdog = (StallWatchdog(cfg.stall_timeout_s, what="eval progress")
                .start() if cfg.stall_timeout_s > 0 else None)

    if cfg.eval_decoder not in ("attention", "ctc_greedy"):
        raise ValueError(f"unknown --eval_decoder {cfg.eval_decoder!r} "
                         "(want 'attention' or 'ctc_greedy')")
    if cfg.eval_decoder == "ctc_greedy" and not cfg.ctc:
        raise ValueError("--eval_decoder ctc_greedy needs --ctc True so "
                         "the checkpoint's CTC head is restored")

    tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
    cfg = cfg.replace(vocab_size=tokenizer.get_vocab_size())

    pattern = cfg.shard_glob or os.path.join(cfg.shard_dir,
                                             f"{cfg.split}-*.arsh")
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no eval shards match {pattern}")
    loader = BucketedLoader(files, cfg, is_training=False)
    log.info("eval records: %d in %d shards", loader.num_records, len(files))

    # vocab_size is resolved by now, so this also catches a wrong
    # tokenizer even under --use_saved_config (which copies MODEL_FIELDS
    # but cannot know which subword files the training run used)
    for line in check_model_config(cfg, cfg.save_dir):
        log.warning("model flag differs from the training snapshot "
                    "(%s/config.json) -- %s", cfg.save_dir, line)
    ts = trainer.create_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    ckpt = CheckpointManager(cfg.save_dir)
    restored = ckpt.restore_for_eval(ts, epoch=cfg.restore_epoch)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found in {cfg.save_dir}")
    ts = restored
    log.info("restored epoch %s (step %d)",
             cfg.restore_epoch if cfg.restore_epoch >= 0
             else ckpt.latest_epoch(), int(ts.step))
    if cfg.quantize_decoder != "none":
        from automatic_speech_recognition_tpu.ops import quant
        ts = ts._replace(params=quant.maybe_quantize_params(ts.params, cfg))
        log.info("decoder weights quantized (%s)", cfg.quantize_decoder)

    # SPMD eval over the same ('data','model') mesh training uses: params
    # by the tensor-parallel rule, batches along 'data' (the reference
    # evals on one hardcoded device, test.py:24).  Multi-process jobs
    # keep the process-local path: eval batches are host-local numpy and
    # the stitch (make_array_from_process_local_data) only pays off for
    # training-scale step counts.
    params, bn_state = ts.params, ts.bn_state
    dp = 1
    if jax.process_count() == 1:
        from automatic_speech_recognition_tpu.parallel import sharding as shd
        from automatic_speech_recognition_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(num_partitions=cfg.num_partitions,
                         data_axis=cfg.data_axis, model_axis=cfg.model_axis)
        dp = mesh.shape[cfg.data_axis]
        params, bn_state = shd.place_eval_params(mesh, params, bn_state,
                                                 cfg.model_axis)
        data_sh = lambda arrs: shd.place_data_batch(mesh, arrs,
                                                    cfg.data_axis)
        log.info("eval mesh: %s over %d devices", dict(mesh.shape),
                 mesh.size)
    else:
        data_sh = lambda arrs: tuple(jax.numpy.asarray(a) for a in arrs)

    if cfg.audio_shards:
        from automatic_speech_recognition_tpu.ops import frontend
        featurize = jax.jit(
            lambda sig, siglen: frontend.featurize_batch(sig, siglen, cfg))

    hyps, refs = [], []
    skipped = 0
    for batch in loader:
        audio, audiolen, ys, yslen = batch
        real_b = audio.shape[0]
        # pad partial batches back up to the bucket's own static shape,
        # rounded to a multiple of the data-parallel axis so dim 0
        # shards evenly (padded rows carry audiolen=1 and are discarded
        # below)
        cap = loader.batch_size_for(audio.shape[1]) or real_b
        cap = -(-max(cap, real_b) // dp) * dp
        if real_b < cap:
            pad = cap - real_b
            audio = np.pad(audio, ((0, pad),) + ((0, 0),) * (audio.ndim - 1))
            audiolen = np.pad(audiolen, (0, pad), constant_values=1)
        try:
            if cfg.audio_shards:
                # raw-waveform shards: featurize in ONE extra device
                # dispatch per batch (the padded sample width is a bucket
                # boundary, so shape keys stay one-per-bucket); inside the
                # try so a failed batch is SKIPPED like any other eval
                # dispatch failure, not fatal.  Runs BEFORE the data
                # sharding: the fused frontend is a Pallas call, which
                # GSPMD cannot partition — the features are resharded
                # onto the mesh afterwards (one device-to-device put).
                audio, audiolen = featurize(jax.numpy.asarray(audio),
                                            jax.numpy.asarray(audiolen))
            audio, audiolen = data_sh((audio, audiolen))
            dec_steps = max(int(cfg.convert_rate * audio.shape[1]), 1)
            if cfg.eval_decoder == "ctc_greedy":
                from automatic_speech_recognition_tpu.decoding.ctc import \
                    ctc_greedy_decode
                toks, lens = ctc_greedy_decode(params, bn_state,
                                               audio, audiolen, cfg)
                toks = np.asarray(jax.device_get(toks))
                lens = np.asarray(jax.device_get(lens))
                # pad the collapsed ids with <EOS> so detokenization cuts
                # there even when the CTC path never emits one itself
                y_hat = np.where(
                    np.arange(toks.shape[1])[None, :] < lens[:, None],
                    toks, 2)
            else:
                _, y_hat = trainer.eval_forward(params, bn_state,
                                                audio, audiolen, cfg,
                                                dec_steps)
        except Exception as e:  # reference skips bad eval batches silently
            log.warning("eval batch failed, skipping %d utts: %s",
                        real_b, e)  # test.py:105-111 (but accounted for)
            skipped += real_b
            continue
        if watchdog is not None:
            watchdog.pet()
        y_hat = np.asarray(jax.device_get(y_hat))[:real_b]
        for i in range(y_hat.shape[0]):
            hyps.append(convert_idx_to_string(y_hat[i],
                                              tokenizer.id_to_token, cfg.unit))
            refs.append(convert_idx_to_string(ys[i],
                                              tokenizer.id_to_token, cfg.unit))
        log.info("decoded %d utts", len(hyps))

    if watchdog is not None:
        watchdog.stop()  # host-only file IO and WER math from here
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(os.path.join(cfg.log_dir, "test_pred.txt"), "w") as f:
        f.write("\n".join(hyps))
    with open(os.path.join(cfg.log_dir, "test_gt.txt"), "w") as f:
        f.write("\n".join(refs))

    if not refs:
        raise RuntimeError(
            f"no utterances decoded ({skipped} skipped by errors); "
            "refusing to report a WER over an empty set")
    w = corpus_wer(refs, hyps)
    if skipped:
        log.warning("WER computed over %d utts; %d skipped due to errors",
                    len(refs), skipped)
    if getattr(loader, "dropped", 0):
        log.warning("%d utterances beyond the last bucket boundary were "
                    "dropped by the loader", loader.dropped)
    log.info("WER: %.4f over %d utterances", w, len(refs))
    if cfg.report_cer:
        c = corpus_cer(refs, hyps)
        log.info("CER: %.4f", c)
        print(f"CER: {c:.4f}")
    print(f"WER: {w:.4f}")
    return w


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
