"""Train a LAS model on ARSH shards (reference driver: train.py:27-133).

TPU-native restructuring of the reference script: instead of a tf.Session
step loop on one hardcoded GPU, the whole optimization step (forward +
backward + Adam) is ONE jitted SPMD program over a ('data','model') mesh;
the host only feeds bucketed static-shape batches through a prefetch
thread and writes logs/checkpoints.

Example (tiny smoke run):
  python train.py --unit char --feat_dim 13 --enc_units 32 --dec_units 32 \\
      --shard_dir /tmp/shards --save_dir /tmp/model --log_dir /tmp/log \\
      --epoch 1 --steps_per_epoch 10
"""

from __future__ import annotations

import glob
import logging
import os
import signal
import sys
import time


from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()  # must run before the jax backend is frozen
import jax
import numpy as np

from automatic_speech_recognition_tpu.config import (
    check_model_config, parse_args, save_config_snapshot)
from automatic_speech_recognition_tpu.data.pipeline import (
    BucketedLoader, DevicePrefetcher)
from automatic_speech_recognition_tpu.parallel.mesh import make_mesh
from automatic_speech_recognition_tpu.parallel.distributed import (
    maybe_initialize)
from automatic_speech_recognition_tpu.training import monitor as monitor_lib
from automatic_speech_recognition_tpu.training import trainer
from automatic_speech_recognition_tpu.training.checkpoint import CheckpointManager
from automatic_speech_recognition_tpu.utils import memlog
from automatic_speech_recognition_tpu.utils import summary as summary_lib
from automatic_speech_recognition_tpu.utils.text import convert_idx_to_string
from automatic_speech_recognition_tpu.utils.watchdog import StallWatchdog
from automatic_speech_recognition_tpu.utils.tokenizer import get_tokenizer


def setup_logging(verbose: int = 0):
    logging.basicConfig(
        force=True, stream=sys.stdout, level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(message)s")
    return logging.getLogger("train")


def main(argv=None):
    cfg = parse_args(argv)
    log = setup_logging(cfg.verbose)
    # failure detection from the FIRST device touch: on a dead tunnel,
    # backend init / restore / the first compile wedge exactly like a
    # dispatch does (observed: a backend init blocked >10 min after an
    # UNAVAILABLE outage), and a watchdog created only at the train loop
    # cannot see it.  Re-armed with the same budget per dispatch below.
    watchdog = (StallWatchdog(cfg.stall_timeout_s, what="startup").start()
                if cfg.stall_timeout_s > 0 else None)
    maybe_initialize()  # multi-host TPU pods; no-op single process
    if ((cfg.online_speed_perturb or cfg.online_volume_perturb
         or cfg.online_noise_perturb) and not cfg.audio_shards):
        raise ValueError("online waveform augmentation needs "
                         "--audio_shards True (the waveform must be "
                         "inside the train step)")

    tokenizer = get_tokenizer(cfg.unit, cfg.subword_dir)
    cfg = cfg.replace(vocab_size=tokenizer.get_vocab_size())
    log.info("vocab size: %d (%s)", cfg.vocab_size, cfg.unit)

    pattern = cfg.shard_glob or os.path.join(cfg.shard_dir, "train-*.arsh")
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no training shards match {pattern}")
    nproc = jax.process_count()
    if nproc > 1:
        # multi-host input: identical global batch sequence everywhere
        # (same seed), per-process row-slice assembly (data/pipeline.py)
        if cfg.steps_per_dispatch > 1:
            raise ValueError(
                "--steps_per_dispatch > 1 is a single-host dispatch "
                "amortization (tunnel platforms); use 1 on TPU pods where "
                "the state never leaves the devices")
        if cfg.num_partitions > 1 and (
                jax.local_device_count() % cfg.num_partitions):
            raise ValueError(
                f"num_partitions {cfg.num_partitions} must divide the "
                f"local device count ({jax.local_device_count()}) so each "
                "model-parallel group stays within one process and "
                "checkpoint saves see fully-addressable params")
    loader = BucketedLoader(files, cfg, is_training=True, seed=cfg.seed,
                            part_index=jax.process_index(),
                            part_count=nproc)
    log.info("training records: %d in %d shards", loader.num_records,
             len(files))

    # precedence: explicit --steps_per_epoch > explicit --num_train_batches
    # (reference-parity knob; pass 2619, the reference's own derived value
    # for train-100+360, train.py:107-110) > derived (default 0) from this
    # dataset's per-bucket record counts
    if cfg.steps_per_epoch:
        steps_per_epoch = cfg.steps_per_epoch
    elif cfg.num_train_batches:
        steps_per_epoch = cfg.num_train_batches
    else:
        steps_per_epoch = loader.batches_per_epoch()
    log.info("steps per epoch: %d", steps_per_epoch)
    mesh = make_mesh(num_partitions=cfg.num_partitions,
                     data_axis=cfg.data_axis, model_axis=cfg.model_axis)
    dp = mesh.shape[cfg.data_axis]
    bad = [b for b in cfg.bucket_batch_sizes if b % dp]
    if bad:
        raise ValueError(
            f"bucket_batch_sizes {bad} not divisible by the data-parallel "
            f"mesh axis ({dp} devices); adjust --bucket_batch_sizes or "
            f"--num_partitions")
    log.info("mesh: %s over %d devices (%s)", dict(mesh.shape),
             mesh.size, jax.devices()[0].platform)

    primary = jax.process_index() == 0
    # dead-basin trend alarms over the same scalars this loop logs
    # (training/monitor.py; primary only — metrics are replicated)
    monitor = (monitor_lib.BindingMonitor(
                   min_step=cfg.monitor_min_step,
                   plateau_frac=cfg.monitor_plateau_frac)
               if cfg.monitor_binding and primary else None)
    ts = trainer.create_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    ckpt = CheckpointManager(cfg.save_dir, max_to_keep=cfg.max_to_keep)
    # refuse to resume with model flags that contradict the directory's
    # snapshot BEFORE touching it (a blind overwrite would poison the
    # snapshot exactly when the user needs it to see their mistake).
    # Keyed on config.json alone — NOT latest_epoch() — because restore()
    # can also roll back a crashed-overwrite backup (N.replaced) that
    # all_steps() doesn't see; check_model_config returns [] when the
    # snapshot is absent.
    mismatched = check_model_config(cfg, cfg.save_dir)
    if mismatched:
        raise ValueError(
            f"{cfg.save_dir} holds checkpoints trained with different "
            "model flags than this command line:\n  "
            + "\n  ".join(mismatched)
            + "\nfix the flags (or use a fresh --save_dir)")
    start_epoch = 0
    restored = ckpt.restore(ts, epoch=cfg.restore_epoch)
    if restored is not None:
        ts = restored
        start_epoch = (cfg.restore_epoch if cfg.restore_epoch >= 0
                       else ckpt.latest_epoch())
        log.info("restored epoch %d (global step %d)", start_epoch,
                 int(ts.step))
    if primary:
        # self-describing model dir: eval drivers validate their model
        # flags against this snapshot (config.check_model_config).
        # Written only after the restore-or-init above succeeded.
        save_config_snapshot(cfg, cfg.save_dir)
    # one summary writer across the job: non-primary processes log the
    # same replicated scalars, so their writers would only duplicate
    writer = (summary_lib.SummaryWriter(cfg.summary_dir) if primary
              else summary_lib.NullSummaryWriter())
    timers = summary_lib.StageTimer()

    it = iter(loader)
    first = next(it)
    step_fn, ts, shard_batch = trainer.make_mesh_train_step(
        mesh, ts, first, cfg)

    def feed():
        yield first
        yield from it

    # multi-step dispatch stacks K host batches before ONE device transfer;
    # the prefetcher only device_puts in single-step mode
    put_fn = shard_batch if cfg.steps_per_dispatch <= 1 else (lambda b: b)
    batches = DevicePrefetcher(feed(), put_fn, depth=cfg.prefetch_depth)
    total_steps = cfg.epoch * steps_per_epoch
    global_step = int(jax.device_get(ts.step))
    t_last, s_last = time.perf_counter(), global_step
    mem_last_step = -(10 ** 9)  # first log line carries a hostmem snapshot
    proc_start_step, recycle_armed = global_step, False

    # graceful preemption: SIGTERM/SIGINT save a checkpoint before exit
    # (failure-recovery subsystem the reference lacks; SURVEY.md §5).
    # stop_armed = raw signal state (this process); stop_requested = the
    # GLOBAL decision every process acts on.  Multi-host, only the
    # any-process reduction in sync_stop_flag promotes armed ->
    # requested, so no process can break out of the collective step loop
    # before the others know — and a signal delivered to ANY host (e.g.
    # single-VM maintenance) stops the whole job.
    stop_armed = []
    stop_requested = []

    def _on_signal(signum, frame):
        stop_armed.append(signum)
        log.info("signal %d received; will checkpoint and stop", signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # non-main thread (e.g. under pytest workers)

    profiling, profile_done = False, False
    # steps_per_dispatch > 1: stack same-bucket batches and scan K steps in
    # one dispatch (see trainer.train_multi_step)
    pending = {}

    def dispatch(batch, remaining):
        nonlocal ts
        if cfg.steps_per_dispatch <= 1:
            ts, metrics = step_fn(ts, batch)
            return 1, metrics
        key = tuple(x.shape for x in batch)  # host arrays; shape is free
        pending.setdefault(key, []).append(batch)
        # near the step budget, flush a short stack so training stops at
        # EXACTLY total_steps instead of overshooting by up to K-1 (one
        # extra jit key for the short stack, amortized by the compile
        # cache across runs)
        eff_k = min(cfg.steps_per_dispatch, max(remaining, 1))
        if len(pending[key]) < eff_k:
            return 0, None
        # take exactly eff_k (another bucket may have accumulated more
        # than the remaining budget while this one was filling)
        group = pending[key][:eff_k]
        pending[key] = pending[key][eff_k:]
        if not pending[key]:
            del pending[key]
        # stack on host, transfer once (jit moves it in a single put)
        stacked = tuple(np.stack([b[i] for b in group])
                        for i in range(len(group[0])))
        ts, metrics = trainer.train_multi_step(
            ts, stacked, cfg, int(group[0][2].shape[1]))
        # report the LAST step of the dispatch (full observability parity
        # with single-step mode; reference logs per step, train.py:114-126)
        return len(group), jax.tree_util.tree_map(lambda x: x[-1], metrics)

    def sync_stop_flag():
        """Promote ANY process's armed signal to the global stop
        decision.  Single-host: immediate.  Multi-host: an any-reduction
        (allgather+max) across processes at the logging cadence (bounded
        extra steps before the preemption checkpoint; per-step sync
        would serialize dispatch), so every process flips in the same
        loop iteration even when the signal landed on one host only."""
        if nproc <= 1:
            if stop_armed:
                stop_requested.append(stop_armed[0])
            return
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.int32(1 if stop_armed else 0))
        if int(np.max(flags)) and not stop_requested:
            stop_requested.append(signal.SIGTERM)

    def host_metrics(metrics):
        """device_get of the metrics dict.  Multi-host: array-valued
        entries (sample_ids/sample_alphas) may be sharded across
        non-addressable devices; only the replicated scalars are
        fetchable everywhere."""
        if nproc > 1:
            metrics = {k: v for k, v in metrics.items()
                       if getattr(v, "ndim", 1) == 0}
        return jax.device_get(metrics)

    # startup survived; from here each dispatch must make the deadline
    if watchdog is not None:
        watchdog.extend(cfg.stall_timeout_s, what="training dispatch")
    for batch in batches:
        # planned recycle: global_step is identical on every process, so
        # this decision is deterministic across hosts (no collective
        # needed, unlike the signal path) — all processes checkpoint and
        # exit 21 in the same iteration, the supervisor relaunches, and
        # the fresh client starts with zero retained transfer buffers.
        if (cfg.recycle_after_steps > 0 and not recycle_armed
                and global_step - proc_start_step >= cfg.recycle_after_steps):
            recycle_armed = True
            stop_requested.append(signal.SIGTERM)
            if primary:
                log.info("recycle_after_steps=%d reached (%d steps this "
                         "process, %s); checkpointing and exiting %d for "
                         "the supervisor to relaunch",
                         cfg.recycle_after_steps,
                         global_step - proc_start_step,
                         memlog.breakdown(), memlog.RECYCLE_EXIT_CODE)
        if nproc == 1:
            sync_stop_flag()  # immediate single-host signal response
        if stop_requested:
            epoch = max(1, global_step // steps_per_epoch + 1)
            ckpt.save(epoch, jax.device_get(ts))  # all processes (orbax
            if primary:                           # coordinates the write)
                log.info("%s checkpoint saved at step %d (epoch slot %d)",
                         "recycle" if recycle_armed else "preemption",
                         global_step, epoch)
            break
        if global_step >= total_steps:
            break
        if cfg.profile_dir and not profiling and not profile_done \
                and global_step >= 10:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True
        with timers.stage("train_step"):
            n_done, metrics = dispatch(batch, total_steps - global_step)
        if watchdog is not None:
            watchdog.pet()
        if n_done == 0:
            continue
        global_step += n_done
        if profiling and global_step >= 20:
            jax.profiler.stop_trace()
            profiling, profile_done = False, True
            log.info("profiler trace written to %s", cfg.profile_dir)
        if global_step % 10 < n_done or global_step <= n_done:
            sync_stop_flag()
            m = host_metrics(metrics)
            now = time.perf_counter()
            sps = (global_step - s_last) / max(now - t_last, 1e-9)
            t_last, s_last = now, global_step
            if primary:
                log.info("step %d/%d loss %.4f lr %.2e tf %.2f gnorm %.2f "
                         "att %.2f (%.2f steps/s)", global_step, total_steps,
                         m["loss"], m["lr"], m["tf_rate"], m["grad_norm"],
                         m["att_peak"], sps)
                # host-memory growth curve (VERDICT r4 weak #5: 96 GB RSS
                # observed, unattributed) — coarse cadence, ~free
                if global_step - mem_last_step >= 500:
                    mem_last_step = global_step
                    log.info("hostmem: %s", memlog.breakdown())
            writer.scalar("train/loss", m["loss"], global_step)
            writer.scalar("train/att_peak", m["att_peak"], global_step)
            writer.scalar("train/steps_per_sec", sps, global_step)
            if monitor is not None:
                for alarm in monitor.update(global_step, float(m["loss"]),
                                            float(m["att_peak"])):
                    log.warning("training-health monitor: %s", alarm)
                    writer.scalar("train/monitor_alarm", 1.0, global_step)
                    if cfg.monitor_abort:
                        epoch = max(1, global_step // steps_per_epoch + 1)
                        ckpt.save(epoch, jax.device_get(ts))
                        log.error("monitor_abort: checkpoint saved at step "
                                  "%d; exiting %d (diverged — supervisors "
                                  "should NOT retry this configuration)",
                                  global_step, monitor_lib.DIVERGED_EXIT_CODE)
                        sys.exit(monitor_lib.DIVERGED_EXIT_CODE)
            if not np.isnan(m["lr"]):
                writer.scalar("train/lr", m["lr"], global_step)
                writer.scalar("train/tf_rate", m["tf_rate"], global_step)
            if cfg.verbose and nproc == 1 \
                    and m.get("sample_ids") is not None:
                # HYP/REF pairs (reference: train.py:119-124)
                hyp = convert_idx_to_string(m["sample_ids"],
                                            tokenizer.id_to_token, cfg.unit)
                writer.text("train/hyp", hyp, global_step)
                writer.image("train/alphas", m["sample_alphas"], global_step)
                if not cfg.audio_shards:
                    # input-feature image of sample 0 (reference:
                    # las.py:297-299); raw-waveform batches have no
                    # feature plane on the host to render
                    feat_img = np.asarray(batch[0])[0, :, :, 0].T
                    writer.image("train/features", feat_img, global_step)
                log.info("HYP: %s", hyp[:120])
        # jump-safe: global_step advances by n_done at a time
        if global_step % steps_per_epoch < n_done:
            epoch = global_step // steps_per_epoch
            with timers.stage("checkpoint"):
                # non-blocking: orbax persists to disk while training goes on
                ckpt.save(epoch, jax.device_get(ts), block=False)
            if primary:
                log.info("saved epoch %d -> %s", epoch, cfg.save_dir)

    # release the worker thread and its staged device batches (the train
    # loader is infinite, so the loop above always abandons the stream).
    # The drain below (prefetcher join, final blocking save, ckpt.close)
    # runs device work that can wedge on the same dead tunnel the
    # watchdog exists for — re-arm with a generous budget, don't disarm.
    if watchdog is not None:
        watchdog.extend(max(watchdog.timeout_s, 600.0),
                        what="shutdown drain")
    batches.close()
    if profiling:  # run ended before the stop step; close the trace
        jax.profiler.stop_trace()
        log.info("profiler trace (short run) written to %s", cfg.profile_dir)
    if global_step % steps_per_epoch and not stop_requested:
        ckpt.save(max(1, global_step // steps_per_epoch + 1),
                  jax.device_get(ts))
    ckpt.close()  # drain any in-flight async save before exit
    if watchdog is not None:
        watchdog.stop()
    log.info("done at step %d; timers: %s", global_step, timers.report())
    writer.close()
    if recycle_armed and global_step < total_steps:
        sys.exit(memlog.RECYCLE_EXIT_CODE)


if __name__ == "__main__":
    from automatic_speech_recognition_tpu.utils.platform import \
        exit_for_transient_errors
    exit_for_transient_errors(main)  # exit 18 on dead-platform errors
