"""Configuration system.

One dataclass shared by every entry point, replacing both the reference's
argparse namespace (las/arguments.py:12-232) and its *shadow config layer* of
constants hardcoded across files (bucket tables tfrecord_data_loader.py:75-83,
MAXLEN create_tfrecord.py:28, shard size create_tfrecord.py:29, sample
threshold preprocess.py:17, steps/epoch train.py:107-110).

All public flag names and defaults from the reference are preserved so that
command lines written for the reference keep working.  TPU-specific knobs
(mesh axes, dtype, buckets) are additive.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Tuple


def str2bool(v) -> bool:
    """Boolean flag parser (reference: las/arguments.py:4-10)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


@dataclass(frozen=True)
class Config:
    """All hyper-parameters of the framework.

    Field names mirror las/arguments.py so the CLI contract is identical.
    """

    # ---- feature arguments (reference: las/arguments.py:17-56) ----
    dataset: str = "LibriSpeech"
    unit: str = "subword"                 # 'char' | 'subword'
    sample_rate: int = 16000
    feat_dim: int = 39                    # num_cepstral (mfcc) / num_filters (fbank)
    frame_length: int = 25                # ms
    frame_step: int = 10                  # ms
    feat_type: str = "mfcc"               # 'mfcc' | 'fbank'
    cmvn: bool = True
    augmentation: bool = False
    split: str = "dev"
    # SpecAugment (beyond-reference, on-device in the train step;
    # ops/augmentation.py:spec_augment).  Widths sized for 13-dim MFCC;
    # sa_time_ratio caps each time mask at that fraction of the utterance.
    spec_augment: bool = False
    sa_freq_masks: int = 2
    sa_freq_width: int = 3
    sa_time_masks: int = 2
    sa_time_width: int = 40
    sa_time_ratio: float = 0.2

    # ---- training arguments (reference: las/arguments.py:58-107) ----
    verbose: int = 0
    batch_size: int = 32
    lr: float = 1e-3
    grad_clip: float = 5.0
    dropout_rate: float = 0.5
    epoch: int = 10
    restore_epoch: int = -1
    label_smoothing: bool = True
    apply_bn: bool = False
    add_vn: bool = False
    ctc: bool = False
    ctc_weight: float = 0.2

    # ---- Listener (reference: las/arguments.py:109-124) ----
    enc_type: str = "cnn"                 # 'cnn' | 'pblstm'
    enc_units: int = 64
    num_enc_channels: int = 32
    num_enc_layers: int = 2

    # ---- Attention (reference: las/arguments.py:126-141) ----
    attention_size: int = 128
    loc_kernel_size: int = 201
    loc_num_channels: int = 10
    mode: str = "add"                     # 'add' | 'loc'

    # ---- Speller / scheduled sampling (reference: las/arguments.py:143-170) ----
    dec_units: int = 128
    num_dec_layers: int = 2
    embedding_size: int = 128
    scheduled_sampling: bool = True
    warmup_step: int = 100000
    max_step: int = 500000
    min_rate: float = 0.4
    # exponential LR decay (reference hardcodes these in las/las.py:351-369;
    # promoted per the shadow-constant policy): hold lr until
    # lr_decay_start, then halve (lr_decay_rate) every lr_decay_step steps,
    # floored at lr_min_ratio * lr
    lr_decay_start: int = 50000
    lr_decay_step: int = 100000
    lr_decay_rate: float = 0.5
    lr_min_ratio: float = 0.01

    # ---- beam search (reference: las/arguments.py:172-187) ----
    convert_rate: float = 0.166
    beam_size: int = 10
    apply_lm: bool = False
    lm_weight: float = 0.5

    # ---- directories (reference: las/arguments.py:189-228) ----
    train_100hr_corpus_dir: str = "data/LibriSpeech/LibriSpeech_train/train-clean-100"
    train_360hr_corpus_dir: str = "data/LibriSpeech/LibriSpeech_train/train-clean-360"
    train_500hr_corpus_dir: str = "data/LibriSpeech/LibriSpeech_train/train-other-500"
    dev_data_dir: str = "data/LibriSpeech-100/LibriSpeech_dev/dev-clean"
    test_data_dir: str = "data/LibriSpeech-100/LibriSpeech_test/test-clean"
    feat_dir: str = "data/LibriSpeech/features"
    subword_dir: str = "subword/"
    log_dir: str = "log/"
    save_dir: str = "model/las/"
    summary_dir: str = "summary/"

    # ---- promoted shadow constants ----
    # reference: tfrecord_data_loader.py:75 (train), :80 (eval)
    bucket_boundaries_train: Tuple[int, ...] = (639, 1062, 1275, 1377, 1449, 1506, 1563, 1710)
    bucket_boundaries_eval: Tuple[int, ...] = (639, 1062, 1275, 1377, 1449, 1506, 1563, 3600)
    # reference: tfrecord_data_loader.py:83
    bucket_batch_sizes: Tuple[int, ...] = (96, 48, 48, 48, 48, 48, 48, 48, 48)
    # reference: tfrecord_data_loader.py:76, :81-82
    max_tokenlen_train: int = 219
    max_tokenlen_eval: int = 227
    # reference: create_tfrecord.py:28-29
    maxlen: int = 1710
    records_per_shard: int = 5000
    # beyond-reference: shards store raw waveforms (S, 1, 1) instead of
    # features, and the on-device frontend runs INSIDE the jitted train
    # step (XLA path; fused with fwd+bwd) / eval dispatch — no preprocess
    # feature stage, no feature storage.  Bucket boundaries, maxlen, and
    # the loader keep their reference FRAME units; sample-space conversion
    # happens internally (frames < b  <=>  samples < b*fstride + flen).
    # Set it for preprocess, create_shards, train, test, and decode alike.
    audio_shards: bool = False
    # beyond-reference, requires audio_shards: resample each training
    # batch on-device at a random rate from this comma-separated list
    # (sox `speed` semantics, same Kaiser-sinc filter as the offline
    # path) instead of the reference's fixed 0.9/1.0/1.1 corpus copies.
    # The loader buckets training records by the slowest rate's output
    # length so the resampled signal fits the bucket's padded buffer.
    online_speed_perturb: bool = False
    online_speed_rates: str = "0.9,1.0,1.1"
    # beyond-reference, requires audio_shards: per-utterance random gain
    # in [low, high] with clipping, applied on-device in the train step
    # (the reference's commented-out VolumeAugmentation, made online)
    online_volume_perturb: bool = False
    online_volume_low: float = 0.8
    online_volume_high: float = 1.2
    # beyond-reference, requires audio_shards: add noise on-device in the
    # train step at a per-utterance random SNR drawn uniformly from
    # [snr_low, snr_high] dB (kind: 'white' flat spectrum or 'pink' 1/f).
    # SNR is measured over the valid samples only and padding stays
    # zeroed, so frame counts and bucket membership are unchanged.
    online_noise_perturb: bool = False
    online_noise_snr_low: float = 5.0
    online_noise_snr_high: float = 20.0
    online_noise_kind: str = "white"
    # probability that a given utterance is noised at all.  1.0 noises
    # everything; the robust study (benchmarks/WER_SYNTH.md) measured
    # that always-on noise makes CLEAN speech out-of-domain (arm B:
    # clean dev WER 0.002 -> 0.276), so mixed-condition training
    # (p < 1 keeps clean utterances in the training distribution) is
    # the recommended setting when clean accuracy still matters.
    online_noise_p: float = 1.0
    # reference: preprocess.py:17
    sample_threshold: int = 30000
    # reference: train.py:107-108 hardcodes 2619 (its derived value for
    # train-100+360).  0 = derive from this dataset's per-bucket record
    # counts; any explicit value (e.g. 2619 for reference parity) is
    # honored as-is.
    num_train_batches: int = 0
    # reference: test.py:102
    num_eval_batches: int = 45
    # checkpoints kept by the epoch saver (reference hardcodes 30,
    # train.py:83); raise for long runs that must restore early epochs
    max_to_keep: int = 30
    # data pipeline locations (reference hardcodes globs, train.py:46 / test.py:48)
    shard_dir: str = "data/shards"
    shard_glob: str = ""                  # override shard file glob; empty = derived
    # LM fusion state dims come from the LM manifest, not hardcoded
    # (reference hardcodes 512/4 at beam_search.py:112)
    lm_dir: str = "lang/output/"
    # beam decode batching (decode.py); promoted rather than hardcoded
    decode_batch: int = 8
    decode_pad_quantum: int = 128         # frames; padded shapes quantize
    # compat switch: False = accumulate RAW decoder logits like the
    # reference (las/beam_search.py:123-124); True = proper log-softmax
    beam_logprob: bool = False
    # hypothesis length normalization: <0 = reference score/len
    # (beam_search.py:297-312); >=0 = GNMT ((5+len)/6)^alpha (0 disables
    # normalization; fractional alpha damps early-EOS selection)
    beam_len_penalty: float = -1.0
    # GNMT coverage penalty (Wu et al. 2016 eq. 14), beyond-reference:
    # final score += beta * sum_j log(min(sum_t alpha_tj, 1)) over real
    # frames — hypotheses that retire with unattended audio (early-EOS
    # truncations, insertion loops stuck on one region) are penalized.
    # 0 = off (reference behavior); intended with --beam_logprob True.
    # NOTE: measured on char ASR this formulation REWARDS insertion loops
    # (decode steps << encoder frames, so loops accumulate more coverage
    # than correct hypotheses — benchmarks/WER_SYNTH.md); prefer the
    # count-based beam_coverage_reward below.
    beam_coverage_penalty: float = 0.0
    # Count-based coverage reward (Chorowski & Jaitly 2017 sec. 4):
    # final score += beta * |{real frames j : sum_t alpha_tj > tau}|.
    # Bounded per frame, so loops gain nothing after crossing tau on
    # their parked region while truncations forfeit the uncovered tail.
    # 0 = off; intended with --beam_logprob True.
    beam_coverage_reward: float = 0.0
    beam_coverage_tau: float = 0.5
    # EOS end-detection margin (Chorowski & Jaitly 2017 sec. 4): an EOS
    # expansion is only admitted when score(EOS) >= best non-EOS score
    # minus this margin, stopping cheap early-EOS retirements the length
    # normalization would otherwise favor.  Negative = off (reference
    # behavior); 0 = EOS must be the argmax; intended with
    # --beam_logprob True (the margin is a log-prob ratio then).
    beam_eos_margin: float = -1.0
    # greedy end detection (the greedy counterpart of beam_eos_margin,
    # applied as a stopping rule over the rolled-out logits): the
    # hypothesis is cut at the first step where score(EOS) >= best
    # content-token score minus this margin.  Rescues insertion-looping
    # models whose argmax never picks EOS — measured on the robustness
    # study's mixed-condition arm (benchmarks/WER_SYNTH.md).  The
    # logit difference is softmax-shift-invariant, so raw logits are
    # compared directly.  Negative = off (reference greedy parity).
    greedy_eos_margin: float = -1.0
    # joint CTC/attention one-pass decoding (Watanabe et al. 2017),
    # beyond-reference: step score = (1-w)*logP_att + w*dPsi_ctc.  Needs a
    # --ctc-trained checkpoint and --beam_logprob True.  0 = off.
    ctc_beam_weight: float = 0.0
    # eval/decode convenience: True = take the model-defining flags
    # (MODEL_FIELDS) from save_dir/config.json instead of the command
    # line, so an eval needs only --save_dir/--shard_dir/--split
    use_saved_config: bool = False
    # test.py decoder: 'attention' = the reference's greedy argmax rollout
    # (las/las.py:306-318); 'ctc_greedy' = encoder-only CTC collapse
    # (decoding/ctc.py, needs a --ctc-trained checkpoint)
    eval_decoder: str = "attention"
    # training decoder runs ~max(tokenlen) scan steps per batch like the
    # reference (las/las.py:246-249) instead of always max_tokenlen: token
    # padding rounds the batch max up to token_pad_quantum (few static jit
    # shapes per bucket, several-fold less decoder compute on short buckets)
    per_bucket_tokenlen: bool = True
    token_pad_quantum: int = 32
    # compat switch for the reference's CTC sparse-label off-by-one: its
    # `tf.where(...)[:-1]` drops the batch's FINAL non-PAD label (usually
    # the last utterance's <EOS>) from the CTC targets (las/las.py:338).
    # False (default) = correct labels; True = reproduce the quirk so
    # CTC-trained checkpoints can be parity-compared.
    ctc_compat_drop_last: bool = False

    # ---- TPU-native knobs (no reference equivalent) ----
    # inference-only int8 weight quantization of the speller's per-step
    # weight stream ('none' | 'int8'): the decode scan is HBM-bound on
    # re-reading the recurrent kernels every step (RESULTS.md roofline),
    # so int8 halves the binding traffic vs bf16.  Applied by
    # test.py/decode.py/serving to restored float checkpoints; training
    # is always float (ops/quant.py)
    quantize_decoder: str = "none"
    dtype: str = "float32"                # compute dtype: 'float32' | 'bfloat16'
    num_partitions: int = 1               # model-parallel axis size (mesh 'model')
    data_axis: str = "data"               # mesh axis name for batch sharding
    model_axis: str = "model"             # mesh axis name for model sharding
    # Fused whole-utterance Pallas frontend kernel (overlap-reuse DFT +
    # mel-support pruning + in-VMEM CMVN/deltas): measured 5.38 ms vs
    # 7.56 ms for the XLA path on TPU v5e (128 x 10 s batch), max abs err
    # 7.7e-5.  Default on; falls back to the XLA path on non-TPU
    # backends.  Utterances beyond the whole-utterance VMEM budget
    # (>1710 frames) run the same kernel over time chunks with
    # whole-utterance CMVN/deltas in XLA (pallas_frontend.
    # fused_frontend_chunked) — no length limit.
    use_pallas: bool = True
    fft_length: int = 512                 # speechpy fixes fft_length=512
    num_mel_filters: int = 40             # speechpy mfcc default num_filters=40
    max_audio_seconds: float = 36.0       # frontend static padding bound
    prefetch_depth: int = 2               # host->device double buffering
    # >1: stack K same-bucket batches and run K optimizer steps per
    # dispatch (lax.scan) — amortizes dispatch/state-transfer overhead
    steps_per_dispatch: int = 1
    # >1: accumulate gradients over N micro-batches before each Adam
    # update (optax.MultiSteps) — large effective batches without memory
    grad_accum_steps: int = 1
    # rematerialize scan bodies in the backward pass (jax.checkpoint):
    # trades ~2x decoder FLOPs for O(T) less activation memory — for the
    # long buckets (1710 frames) at full model size
    remat: bool = False
    # unroll factor for the sequential RNN/decoder lax.scans: >1 trades
    # compile time + code size for fewer loop iterations (XLA pipelines
    # the unrolled bodies, hiding per-iteration loop overhead)
    scan_unroll: int = 1
    # also report corpus character error rate in test.py (the reference
    # reports only word-level WER, test.py:127-136)
    report_cer: bool = False
    # non-empty: capture a jax.profiler trace of training steps 10-20
    # into this directory (tracing subsystem; reference has none)
    profile_dir: str = ""
    # > 0: hard-abort training (exit code 17) when no dispatch completes
    # for this many seconds — a dead device tunnel otherwise wedges the
    # host INSIDE a device call forever (utils/watchdog.py).  Size it
    # above the first dispatch's compile time on remote-compiled
    # platforms (recommend >= 900 there).  0 = off.
    stall_timeout_s: int = 0
    # training-health trend alarms (training/monitor.py): warn when the
    # smoothed loss has not improved past monitor_plateau_frac of its
    # early value by monitor_min_step, or when teacher-forced att_peak
    # rises and then collapses without binding (the round-4 dead-basin
    # signature).  monitor_abort exits with code 20 (DIVERGED — not
    # retryable, unlike stall 17 / transient 18) on first alarm.
    monitor_binding: bool = True
    monitor_min_step: int = 10000
    monitor_plateau_frac: float = 0.7
    monitor_abort: bool = False
    # > 0: checkpoint and exit with code 21 (PLANNED RECYCLE, retryable
    # without backoff in tools/train_supervised.sh) after this many
    # steps in one process.  Bounds the tunnel-client host-memory leak
    # (docs/OPERATIONS.md "Host memory on tunneled platforms": RSS grows
    # by ~the bytes fed per transfer, client-internal) to
    # bytes_per_dispatch x recycle_after_steps / steps_per_dispatch
    # instead of the whole run.  0 = off (co-located hosts don't leak).
    recycle_after_steps: int = 0
    seed: int = 0
    vocab_size: int = 0                   # filled from tokenizer at runtime
    steps_per_epoch: int = 0              # 0 = derive from dataset size

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=False)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        fields = {f.name for f in dataclasses.fields(Config)}
        d = {k: (tuple(v) if isinstance(v, list) else v) for k, v in d.items() if k in fields}
        return Config(**d)

    @property
    def frames_max(self) -> int:
        """Static frame-count bound for the frontend."""
        samples = int(self.max_audio_seconds * self.sample_rate)
        flen = int(round(self.sample_rate * self.frame_length / 1000.0))
        fstep = int(round(self.sample_rate * self.frame_step / 1000.0))
        return max(0, (samples - flen) // fstep)


# Fields that determine the parameter-tree structure/shapes of a trained
# LAS checkpoint.  An eval/decode run whose values differ from the
# training run's cannot restore the checkpoint (the mismatch otherwise
# surfaces as an opaque orbax tree/shape error deep in restore).
MODEL_FIELDS = (
    "unit", "feat_dim", "feat_type", "cmvn",
    "enc_type", "enc_units", "num_enc_channels", "num_enc_layers",
    "attention_size", "loc_kernel_size", "loc_num_channels", "mode",
    "dec_units", "num_dec_layers", "embedding_size", "apply_bn", "ctc",
    # not a parameter-shape field, but it defines what the model's shards
    # CONTAIN: --use_saved_config eval of an audio-shards model must read
    # waveform shards, or every record is dropped as over-length
    "audio_shards",
)


def save_config_snapshot(cfg: Config, save_dir: str) -> str:
    """Write the resolved training config to save_dir/config.json.

    Reproducibility aid with no reference counterpart (the reference's
    LAS driver records nothing; only its LM trainer persists a manifest,
    train_lm.py:399-401).  The snapshot makes a model directory
    self-describing: eval drivers check it (`check_model_config`) and
    humans can reconstruct the exact command line from it.
    """
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "config.json")
    with open(path, "w") as f:
        f.write(cfg.to_json())
    return path


def apply_saved_model_config(cfg: Config, save_dir: str):
    """Replace cfg's MODEL_FIELDS with the training snapshot's values.

    Backs --use_saved_config: eval/decode runs need only point at the
    model directory; architecture flags come from config.json.  Returns
    (new_cfg, overridden) where overridden lists "field: cli -> saved"
    for every field that actually changed.  Raises FileNotFoundError
    when the snapshot is absent (explicit opt-in deserves a hard error,
    unlike the advisory check_model_config path).
    """
    path = os.path.join(save_dir, "config.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"--use_saved_config: no snapshot at {path} (the checkpoint "
            "predates config snapshots; pass the model flags explicitly)")
    with open(path) as f:
        trained = Config.from_json(f.read())
    overridden = [
        f"{n}: {getattr(cfg, n)!r} -> {getattr(trained, n)!r}"
        for n in MODEL_FIELDS if getattr(cfg, n) != getattr(trained, n)]
    return cfg.replace(
        **{n: getattr(trained, n) for n in MODEL_FIELDS}), overridden


def check_model_config(cfg: Config, save_dir: str):
    """Compare cfg against save_dir/config.json; return mismatch list.

    Returns [] when the snapshot is absent (pre-snapshot checkpoints) or
    all MODEL_FIELDS agree; otherwise a list of human-readable
    "field: ours=x, trained=y" strings for the caller to log before the
    restore fails (or silently decodes garbage with a wrong tokenizer).
    """
    path = os.path.join(save_dir, "config.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        trained = Config.from_json(f.read())
    fields = MODEL_FIELDS
    # vocab_size also shapes the checkpoint (embedding/output layers) but
    # is resolved from the tokenizer at runtime: compare only when both
    # sides have been resolved (train.py snapshots after resolution, so a
    # mismatch here means the EVAL tokenizer differs — e.g. a different
    # --subword_dir — which MODEL_FIELDS alone cannot see)
    if cfg.vocab_size and trained.vocab_size:
        fields = fields + ("vocab_size",)
    return [
        f"{name}: ours={getattr(cfg, name)!r}, trained={getattr(trained, name)!r}"
        for name in fields
        if getattr(cfg, name) != getattr(trained, name)
    ]


_SHORT_FLAGS = {"verbose": "-vb", "batch_size": "-bs"}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="A TPU-native (JAX/XLA/Pallas/pjit) implementation of "
                    "end-to-end speech recognition: Listen, Attend and Spell (LAS)")
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        flags = [name]
        if f.name in _SHORT_FLAGS:
            flags.append(_SHORT_FLAGS[f.name])
        default = f.default if f.default is not dataclasses.MISSING else f.default_factory()
        if f.type in ("bool", bool) or isinstance(default, bool):
            parser.add_argument(*flags, type=str2bool, default=default, help="")
        elif isinstance(default, tuple):
            parser.add_argument(*flags, type=lambda s: tuple(int(x) for x in s.split(",")),
                                default=default, help="comma separated ints")
        elif isinstance(default, int):
            parser.add_argument(*flags, type=int, default=default, help="")
        elif isinstance(default, float):
            parser.add_argument(*flags, type=float, default=default, help="")
        else:
            parser.add_argument(*flags, type=type(default), default=default, help="")
    return parser


def parse_args(argv=None) -> Config:
    """Parse CLI flags into a Config (reference: las/arguments.py:12-232)."""
    ns = build_parser().parse_args(argv)
    return Config(**vars(ns))
