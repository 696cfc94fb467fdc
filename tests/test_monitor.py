"""Training-health monitor: dead-basin alarms fire on the measured
round-4 failure signature and stay silent on healthy / resumed runs
(automatic_speech_recognition_tpu/training/monitor.py)."""

import numpy as np

from automatic_speech_recognition_tpu.training.monitor import BindingMonitor


def drive(mon, traj):
    """traj: iterable of (step, loss, att).  Returns all fired alarms."""
    out = []
    for step, loss, att in traj:
        out += mon.update(step, loss, att)
    return out


def seqs(loss_fn, att_fn, n=2000, cadence=10):
    rng = np.random.default_rng(0)
    for i in range(1, n + 1):
        s = i * cadence
        yield s, loss_fn(s) + rng.normal(0, 0.3), att_fn(s) \
            + rng.normal(0, 0.02)


def test_round4_dead_basin_fires_both():
    # the measured failure: loss 25.8 -> flat 22; att 0.2 -> 0.45 -> 0.25
    def loss(s): return 22.0 + 3.8 * np.exp(-s / 500)
    def att(s):
        return 0.2 + 0.25 * np.exp(-((s - 6000) / 4000.0) ** 2)
    alarms = drive(BindingMonitor(), seqs(loss, att))
    kinds = {a.split(":")[0] for a in alarms}
    assert "loss_plateau" in kinds
    assert "att_collapse" in kinds


def test_healthy_round3_run_silent():
    # round 3: loss 25 -> 2.46 by 8.6k -> 0.55; att binds 0.28@4k ->
    # 0.95@16k plateau
    def loss(s): return 0.55 + 24.5 * np.exp(-s / 3500)
    def att(s): return min(0.95, 0.05 + 0.9 * s / 16000)
    assert drive(BindingMonitor(), seqs(loss, att, n=5000)) == []


def test_bound_then_sampling_dip_silent():
    # a bound run whose att dips later (e.g. scheduled sampling turns
    # on): binding latches, collapse must not fire
    def loss(s): return 1.0 + 24.0 * np.exp(-s / 3000)
    def att(s): return 0.95 if s < 30000 else 0.55
    assert drive(BindingMonitor(), seqs(loss, att, n=5000)) == []


def test_resume_past_early_window_disarms_plateau():
    # fine-tune resumed at step 55k with a converged, flat loss: the
    # early reference is never captured, so no plateau alarm
    mon = BindingMonitor()
    traj = [(55000 + i * 10, 0.6, 0.93) for i in range(2000)]
    assert drive(mon, traj) == []
    assert not mon.alarmed


def test_never_rising_attention_is_plateau_not_collapse():
    # round-2 signature: att never leaves 0.15-0.23, loss stuck high ->
    # loss_plateau fires, att_collapse does not (nothing rose)
    def loss(s): return 20.0
    def att(s): return 0.18
    alarms = drive(BindingMonitor(), seqs(loss, att))
    kinds = {a.split(":")[0] for a in alarms}
    assert kinds == {"loss_plateau"}


def test_alarms_fire_once_and_skip_nonfinite():
    mon = BindingMonitor()
    mon.update(100, float("nan"), 0.2)  # ignored
    fired = drive(mon, ((s, 20.0, 0.18) for s in range(1000, 40000, 10)))
    assert len(fired) == 1
    assert mon.alarmed
