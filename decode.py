"""Beam-search decoding with optional RNNLM shallow fusion
(reference driver: decode.py:1-149).

TPU-native restructuring: the reference decodes ONE utterance at a time
with 2-3 sess.runs per output token (host-side beam bookkeeping,
las/beam_search.py:61-158).  Here whole batches of utterances decode in a
single device call — the beam lives on the TPU inside a lax.while_loop
(decoding/beam.py).  Utterances are still sorted by length (decode.py:122)
— not for fairness but so padded batch shapes stay tight.

Inputs match the reference contract: the feature dumps written by
preprocess.py ({split}-feats[-i].npy, {split}-{unit}s.npy), the LAS
checkpoint from train.py, and optionally a train_lm.py output directory
(--apply_lm, --lm_dir) for fusion.
"""

from __future__ import annotations

import logging
import os
import sys


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import numpy as np

from automatic_speech_recognition_tpu.config import (
    apply_saved_model_config, check_model_config, parse_args)
from automatic_speech_recognition_tpu.decoding import beam as beam_lib
from automatic_speech_recognition_tpu.models import char_rnn
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager
from automatic_speech_recognition_tpu.utils.text import (
    convert_idx_to_string, corpus_cer, edit_distance)
from automatic_speech_recognition_tpu.utils.tokenizer import get_tokenizer

from create_shards import load_cat_feats

logging.basicConfig(force=True, stream=sys.stdout, level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s")
log = logging.getLogger("decode")


def batch_iter(feats, tokens, batch, pad_quantum=128):
    # sort by FEATURE length — that is the padded dimension, so batches
    # stay tight (the reference sorts by token length, decode.py:122-124,
    # which only approximates this)
    order = np.argsort([len(f) for f in feats])
    for lo in range(0, len(order), batch):
        idx = order[lo:lo + batch]
        group = [np.asarray(feats[i], np.float32) for i in idx]
        lens = np.asarray([len(g) for g in group], np.int32)
        T = int(-(-int(lens.max()) // pad_quantum) * pad_quantum)
        D, C = group[0].shape[1], group[0].shape[2]
        audio = np.zeros((len(group), T, D, C), np.float32)
        for r, g in enumerate(group):
            audio[r, :len(g)] = g
        yield audio, lens, [tokens[i] for i in idx]


def main(argv=None):
    cfg = parse_args(argv)
    if cfg.use_saved_config:
        cfg, overridden = apply_saved_model_config(cfg, cfg.save_dir)
        for line in overridden:
            log.info("model flag from training snapshot: %s", line)
    log.info("parameters:\n%s", cfg.to_json())

    # same failure model as training (docs/OPERATIONS.md): a dead tunnel
    # wedges restore / compile / beam dispatches; abort with exit 17 so a
    # supervisor can retry instead of hanging a study script forever
    from automatic_speech_recognition_tpu.utils.watchdog import StallWatchdog
    watchdog = (StallWatchdog(cfg.stall_timeout_s, what="decode progress")
                .start() if cfg.stall_timeout_s > 0 else None)

    tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
    cfg = cfg.replace(vocab_size=tokenizer.get_vocab_size())

    lm_params, lm_cfg = None, None
    if cfg.ctc_beam_weight > 0:
        if not cfg.ctc:
            raise ValueError(
                "--ctc_beam_weight needs --ctc True so the checkpoint's "
                "CTC head is part of the restored parameter structure")
        if not cfg.beam_logprob:
            raise ValueError(
                "--ctc_beam_weight mixes log probabilities; pass "
                "--beam_logprob True")
        log.info("joint CTC/attention decoding, weight %.2f",
                 cfg.ctc_beam_weight)
    elif cfg.ctc:
        # measured on every healthy arm of the synth studies: a ctc_head
        # checkpoint beam-decoded attention-only is the known-worst
        # configuration (WER_SYNTH.md: att-only beam 0.1771 vs joint beam
        # 0.0026 on the same checkpoint) — hint, don't refuse, because
        # attention-only decode of a joint model is still a valid ablation
        log.warning(
            "checkpoint has a CTC head but joint scoring is OFF; the "
            "measured-better decode is --beam_logprob True "
            "--ctc_beam_weight 0.5 (see benchmarks/WER_SYNTH.md)")
    if cfg.apply_lm:
        from sample_lm import load_lm
        lm_params, lm_cfg, _, _ = load_lm(cfg.lm_dir)
        log.info("RNNLM restored from %s", cfg.lm_dir)
        if cfg.unit != "char":
            # the -2 id shift maps CHAR ids onto the LM's 28-token vocab
            # (beam_search.py:228-229); with subword units the mapping is
            # meaningless — mirrored from the reference, but warned about
            log.warning("LM fusion assumes char units; unit=%s will fuse "
                        "garbage scores", cfg.unit)

    import glob as globlib
    if globlib.glob(os.path.join(cfg.feat_dir, f"{cfg.split}-feats*")):
        feats = load_cat_feats(cfg.feat_dir, cfg.split)
        tokens = list(np.load(
            os.path.join(cfg.feat_dir, f"{cfg.split}-{cfg.unit}s.npy"),
            allow_pickle=True))
    else:
        # fall back to ARSH shards (the reference requires the preprocess
        # pickles, decode.py:80-89; shards carry the same records)
        from automatic_speech_recognition_tpu.data.shards import ShardReader
        shard_files = sorted(globlib.glob(
            os.path.join(cfg.shard_dir, f"{cfg.split}-*.arsh")))
        if not shard_files:
            raise FileNotFoundError(
                f"no features for split {cfg.split} in {cfg.feat_dir} and "
                f"no shards in {cfg.shard_dir}; run preprocess.py first")
        feats, tokens = [], []
        for fn in shard_files:
            r = ShardReader(fn)
            for i in range(len(r)):
                f, t = r.record(i)
                feats.append(np.array(f))
                tokens.append(np.array(t))
        log.info("loaded %d records from shards (%s)", len(feats),
                 cfg.shard_dir)
    if cfg.audio_shards:
        # both sources hold raw (S, 1, 1) waveforms in this mode (the
        # preprocess dumps share the -feats naming contract); featurize
        # on device before the usual feature-batch decode loop
        from automatic_speech_recognition_tpu.ops import frontend
        feats = frontend.extract_features_list(
            [np.asarray(f, np.float32).reshape(-1) for f in feats], cfg)
    log.info("decoding %d utterances (beam %d, lm %s)", len(feats),
             cfg.beam_size, cfg.apply_lm)

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
        raise FileNotFoundError(f"no LAS checkpoint in {cfg.save_dir}")
    ts = restored
    log.info("LAS restored (step %d)", int(ts.step))
    if cfg.quantize_decoder != "none":
        from automatic_speech_recognition_tpu.ops import quant
        ts = ts._replace(params=quant.maybe_quantize_params(ts.params, cfg))
        if lm_params is not None:  # fusion LM streams weights per step too
            lm_params = quant.quantize_lm(lm_params, lm_cfg)
        log.info("decoder weights quantized (%s)", cfg.quantize_decoder)

    # SPMD beam decode over the training mesh: params by the
    # tensor-parallel rule, utterance batches along 'data', the fused LM
    # replicated — the beaten reference path is batch=1 on one hardcoded
    # device (reference decode.py:24, beam_search.py:70-72).
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
        if lm_params is not None:
            lm_params, _ = shd.place_eval_params(mesh, lm_params, {},
                                                 cfg.model_axis)
        data_sh = lambda arrs: shd.place_data_batch(mesh, arrs,
                                                    cfg.data_axis)
        log.info("decode mesh: %s over %d devices", dict(mesh.shape),
                 mesh.size)
    else:
        data_sh = lambda arrs: tuple(jax.numpy.asarray(a) for a in arrs)

    error, N, count = 0.0, 0, 0
    hyps, refs = [], []
    for audio, lens, ys in batch_iter(feats, tokens, cfg.decode_batch,
                                      cfg.decode_pad_quantum):
        real_b = audio.shape[0]
        padded_b = -(-real_b // dp) * dp  # shard dim 0 evenly
        if padded_b > real_b:
            pad = padded_b - real_b
            audio = np.pad(audio, ((0, pad),) + ((0, 0),) * (audio.ndim - 1))
            lens = np.pad(lens, (0, pad), constant_values=1)
        audio_d, lens_d = data_sh((audio, lens))
        max_steps = max(int(cfg.convert_rate * audio.shape[1]), 1)
        res = beam_lib.beam_search(
            params, bn_state, audio_d, lens_d, cfg,
            max_steps=max_steps, beam_size=cfg.beam_size,
            logprob=cfg.beam_logprob, lm_params=lm_params, lm_cfg=lm_cfg)
        toks = np.asarray(res.tokens)
        tlen = np.asarray(res.lengths)
        for b in range(real_b):
            hyp = convert_idx_to_string(toks[b, 0, :tlen[b, 0]],
                                        tokenizer.id_to_token, cfg.unit)
            ref = convert_idx_to_string(ys[b], tokenizer.id_to_token,
                                        cfg.unit)
            dist, n = edit_distance(ref.split(" "), hyp.split(" "))
            error += dist
            N += n
            count += 1
            if cfg.verbose > 0:
                log.info("REF | %s", ref)
                log.info("HYP | %s", hyp)
            hyps.append(hyp)
            refs.append(ref)
        log.info("utt %d/%d, running WER: %.4f", count, len(feats),
                 error / max(N, 1))
        if watchdog is not None:
            watchdog.pet()

    if watchdog is not None:
        watchdog.stop()  # host-only file IO and WER math from here
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(os.path.join(cfg.log_dir, "decode_pred.txt"), "w") as f:
        f.write("\n".join(hyps))
    with open(os.path.join(cfg.log_dir, "decode_gt.txt"), "w") as f:
        f.write("\n".join(refs))
    wer = error / max(N, 1)
    log.info("%s WER: %.4f", cfg.split, wer)
    if cfg.report_cer:
        cer = corpus_cer(refs, hyps)
        log.info("%s CER: %.4f", cfg.split, cer)
        print(f"CER: {cer:.4f}")
    print(f"WER: {wer:.4f}")
    return wer


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
