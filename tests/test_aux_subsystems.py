"""Auxiliary subsystems: summary writer, stage timers, augmentation math,
config round trips, and the profiler hook in train.py."""

import json
import os

import numpy as np
import pytest

from automatic_speech_recognition_tpu.config import Config, parse_args
from automatic_speech_recognition_tpu.ops import augmentation
from automatic_speech_recognition_tpu.utils import summary as summary_lib


def test_summary_writer_events(tmp_path):
    w = summary_lib.SummaryWriter(str(tmp_path))
    w.scalar("loss", 1.5, 10)
    w.text("hyp", "HELLO", 10)
    w.image("alphas", np.random.rand(8, 16).astype(np.float32), 10)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "events.jsonl").read().splitlines()]
    kinds = [l["kind"] for l in lines]
    assert kinds == ["scalar", "text", "image"]
    assert lines[0]["value"] == 1.5
    img = lines[2]["file"]
    assert os.path.exists(img) and open(img, "rb").read(2) == b"P5"
    assert os.path.exists(img.replace(".pgm", ".npy"))


def test_stage_timer():
    t = summary_lib.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert t.rate("a", 10) > 0


def test_speed_perturb_lengths_and_identity(rng):
    sig = rng.standard_normal(16000).astype(np.float32)
    # speed 1.0 is the identity
    np.testing.assert_allclose(augmentation.speed_perturb(sig, 1.0), sig,
                               atol=1e-6)
    fast = augmentation.speed_perturb(sig, 1.1)
    slow = augmentation.speed_perturb(sig, 0.9)
    assert len(fast) == int(16000 / 1.1)
    assert len(slow) == int(16000 / 0.9)
    # a pure tone stays a tone at the scaled frequency (coarse check):
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    fast_tone = augmentation.speed_perturb(tone, 1.1)
    zc = np.mean(np.abs(np.diff(np.signbit(fast_tone).astype(int))))
    zc_orig = np.mean(np.abs(np.diff(np.signbit(tone).astype(int))))
    assert zc == pytest.approx(zc_orig * 1.1, rel=0.02)


def test_volume_perturb_clips(rng):
    sig = np.linspace(-1, 1, 100).astype(np.float32)
    v = augmentation.volume_perturb(sig, 1.5)
    assert v.max() <= 1.0 and v.min() >= -1.0
    np.testing.assert_allclose(augmentation.volume_perturb(sig, 0.5),
                               sig * 0.5)


def test_config_json_roundtrip():
    cfg = Config(enc_units=123, mode="loc", dtype="bfloat16",
                 bucket_batch_sizes=(4, 4))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_snapshot_and_model_check(tmp_path):
    """train.py writes save_dir/config.json; eval drivers diff their
    model-defining flags against it (config.MODEL_FIELDS)."""
    from automatic_speech_recognition_tpu.config import (
        check_model_config, save_config_snapshot)
    save_dir = str(tmp_path / "model")
    trained = Config(enc_units=256, dec_units=512, mode="loc", ctc=True,
                     unit="char")
    path = save_config_snapshot(trained, save_dir)
    assert json.load(open(path))["enc_units"] == 256

    # same model flags -> clean; non-model flags (lr, beam) never flag
    assert check_model_config(
        trained.replace(lr=9.0, beam_size=64), save_dir) == []
    # model-shape drift is reported field by field
    bad = trained.replace(enc_units=128, ctc=False)
    lines = check_model_config(bad, save_dir)
    assert len(lines) == 2
    assert any("enc_units" in l and "128" in l and "256" in l for l in lines)
    assert any("ctc" in l for l in lines)
    # no snapshot (pre-feature checkpoint dirs) -> silently clean
    assert check_model_config(bad, str(tmp_path / "nope")) == []

    # --use_saved_config: model fields replaced, others kept, diff reported
    from automatic_speech_recognition_tpu.config import (
        apply_saved_model_config)
    fixed, overridden = apply_saved_model_config(
        bad.replace(lr=9.0, beam_size=64), save_dir)
    assert fixed.enc_units == 256 and fixed.ctc is True
    assert fixed.lr == 9.0 and fixed.beam_size == 64
    assert check_model_config(fixed, save_dir) == []
    assert any("enc_units" in l for l in overridden)
    with pytest.raises(FileNotFoundError):
        apply_saved_model_config(bad, str(tmp_path / "nope"))


def test_parse_args_reference_flags():
    cfg = parse_args(["--unit", "char", "--feat_dim", "13", "-bs", "96",
                      "--mode", "loc", "--scheduled_sampling", "False",
                      "--bucket_batch_sizes", "8,4,4"])
    assert cfg.unit == "char" and cfg.feat_dim == 13
    assert cfg.batch_size == 96 and cfg.mode == "loc"
    assert cfg.scheduled_sampling is False
    assert cfg.bucket_batch_sizes == (8, 4, 4)


def test_sinc_resampler_alias_suppression():
    """The sox-fidelity path must be bandlimited: spurious components of a
    resampled high tone stay >= 60 dB below the peak and >= 40 dB below
    the linear-interpolation path's aliases
    (reference renders through sox, utils/augmentation.py:16-28)."""
    fs = 16000
    t = np.arange(fs) / fs
    tone = np.sin(2 * np.pi * 6000.0 * t).astype(np.float32)

    def spur_db(y, f_expect):
        w = np.hanning(len(y))
        S = np.abs(np.fft.rfft(y * w))
        freqs = np.fft.rfftfreq(len(y), 1 / fs)
        pk = np.argmax(S)
        assert abs(freqs[pk] - f_expect) < 5.0, (freqs[pk], f_expect)
        mask = np.abs(freqs - freqs[pk]) > 30
        return 20 * np.log10(S[mask].max() / S[pk])

    for speed in (0.9, 1.1):
        sinc = spur_db(augmentation.speed_perturb(tone, speed, "sinc"),
                       6000.0 * speed)
        lin = spur_db(augmentation.speed_perturb(tone, speed, "linear"),
                      6000.0 * speed)
        assert sinc <= -60.0, sinc
        assert sinc <= lin - 40.0, (sinc, lin)


def test_formant_synth_produces_phonetic_structure():
    """The corpus synthesizer must produce distinct, stable acoustics per
    phone class: fricative energy high, vowel energy low, correct F1
    ordering (utils/formant_synth.py feeds tools/synth_corpus.py)."""
    from automatic_speech_recognition_tpu.utils import formant_synth as fsyn

    def centroid(phone):
        sig = fsyn.synth_phones([phone] * 3, fsyn.Speaker(),
                                np.random.default_rng(2))
        mid = sig[len(sig) // 3:2 * len(sig) // 3]
        S = np.abs(np.fft.rfft(mid)) ** 2
        f = np.fft.rfftfreq(len(mid), 1 / 16000)
        return float((S * f).sum() / S.sum())

    assert centroid("S") > 4500
    assert 2500 < centroid("SH") < 4500
    assert centroid("IY") < centroid("AA") < 1500  # F1 ordering
    sig = fsyn.synth_phones(["HH", "EH", "L", "OW"], fsyn.Speaker(),
                            np.random.default_rng(0))
    assert sig.dtype == np.float32 and 0.2 < np.abs(sig).max() <= 1.0
    # speakers differ audibly (different f0 -> different waveforms)
    a = fsyn.synth_phones(["AA"], fsyn.Speaker(f0_base=100),
                          np.random.default_rng(1))
    b = fsyn.synth_phones(["AA"], fsyn.Speaker(f0_base=220),
                          np.random.default_rng(1))
    n = min(len(a), len(b))
    assert np.abs(a[:n] - b[:n]).max() > 0.01


def test_synth_corpus_lexicon_is_complete():
    """Every word producible by the sentence grammar must have a
    pronunciation, and every phone must exist in the inventory."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "synth_corpus", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "tools", "synth_corpus.py"))
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    from automatic_speech_recognition_tpu.utils.formant_synth import PHONES
    vocab = set(sc.NOUNS + sc.VERBS + sc.ADJS + sc.PRONOUNS + sc.PREPS
                + sc.ADVS + sc.NUMS
                + ["THE", "A", "AND", "OF", "THAT", "WAS", "THERE", "WHEN"])
    for w in vocab:
        assert w in sc.LEXICON, f"missing pronunciation: {w}"
    for w, pron in sc.LEXICON.items():
        for ph in pron.split():
            assert ph in PHONES, f"{w}: unknown phone {ph}"
    rng = np.random.default_rng(0)
    for _ in range(200):
        for word in sc.make_sentence(rng).split():
            assert word in sc.LEXICON, word


def test_pseudo_word_lexicon():
    """--pseudo_words: deterministic, unique, phonotactically valid
    pseudo-words with systematic A-Z spellings; after installation the
    sentence grammar draws them Zipf-weighted and every emitted word
    stays pronounceable (the high-entropy corpus mode behind the
    capacity-vs-entropy study in benchmarks/WER_SYNTH.md)."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "synth_corpus_pw", os.path.join(os.path.dirname(__file__),
                                        os.pardir, "tools",
                                        "synth_corpus.py"))
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)
    from automatic_speech_recognition_tpu.utils.formant_synth import PHONES

    lex = sc.make_pseudo_lexicon(300, seed=7)
    assert len(lex) == 300
    assert lex == sc.make_pseudo_lexicon(300, seed=7)       # deterministic
    assert lex != sc.make_pseudo_lexicon(300, seed=8)       # seed matters
    for w, pron in lex.items():
        assert w.isalpha() and w.isupper() and len(w) <= 14, w
        assert w not in sc._HAND_WORDS                      # no homographs
        for ph in pron.split():
            assert ph in PHONES, (w, ph)

    # n < 7 would leave a 60/25/15 content pool empty: must fail BEFORE
    # any corpus files are written, not mid-generation
    with pytest.raises(ValueError, match="pseudo_words"):
        sc.install_pseudo_lexicon(3, seed=7)

    installed = sc.install_pseudo_lexicon(300, seed=7)
    assert installed == lex                  # install doesn't reshuffle
    # generation must stay deterministic after LEXICON grew (dedupe is
    # against the frozen hand lexicon, not the live dict)
    assert sc.make_pseudo_lexicon(300, seed=7) == lex
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(300):
        for word in sc.make_sentence(rng).split():
            assert word in sc.LEXICON, word
            seen.add(word)
    # content slots actually draw pseudo-words, with a Zipf tail: far
    # more types than the ~60 the hand pools would yield here
    assert len(seen & set(lex)) > 150, len(seen & set(lex))


def test_sinc_resampler_exact_ratio_and_live_tail():
    """Sample-rate ratios within den<=1000 resolve exactly (11025/16000 =
    441/640) and the output tail is interpolated, not zero-filled."""
    from fractions import Fraction
    frac = augmentation._rational_speed(11025.0 / 16000.0)
    assert (frac.numerator, frac.denominator) == (441, 640)
    fs = 16000
    t = np.arange(int(fs * 1.3)) / fs
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = augmentation.speed_perturb(tone, 11025.0 / 16000.0)
    assert len(out) == int(len(tone) / (11025.0 / 16000.0))
    # the final samples carry signal (previously silently zeroed)
    assert np.abs(out[-40:]).max() > 0.05


def test_stop_burst_and_voiced_tail_survive_fast_rates():
    """Stops/affricates keep their burst AND voiced tail even when a fast
    speaker + a short random duration draw shrink the segment: the
    closure/burst frame counts scale with the realized segment length
    instead of the nominal one (utils/formant_synth.py:build_tracks)."""
    import numpy as np
    from automatic_speech_recognition_tpu.utils import formant_synth as fsyn

    spk = fsyn.Speaker(rate=1.15)
    # many draws so the U(0.82, 1.25) duration factor hits its low end
    for seed in range(8):
        rng = np.random.default_rng(seed)
        tracks = fsyn.build_tracks(["JH", "AA", "JH"], spk, rng)
        vg = tracks["voiced_gain"] if "voiced_gain" in tracks else None
        assert vg is None or np.max(vg) > 0
        # burst noise must exist somewhere (color tracks carry it)
        total_noise = sum(float(np.max(v)) for k, v in tracks.items()
                          if isinstance(v, np.ndarray) and v.ndim == 1
                          and k not in ("voiced_gain", "f0"))
        assert total_noise > 0, seed


def test_device_prefetcher_close_and_reiterate():
    """close() releases the worker on an infinite stream; an exhausted
    prefetcher raises StopIteration again instead of deadlocking."""
    import itertools
    from automatic_speech_recognition_tpu.data.pipeline import DevicePrefetcher

    # infinite stream: a consumer that abandons early must be able to
    # close() without hanging, and the worker thread must exit
    pf = DevicePrefetcher(itertools.count(), lambda x: x, depth=2)
    assert next(pf) == 0
    pf.close()
    assert not pf._t.is_alive()
    with pytest.raises(StopIteration):
        next(pf)

    # finite stream: second pass terminates instead of blocking forever
    pf2 = DevicePrefetcher(iter([1, 2]), lambda x: x, depth=2)
    assert list(pf2) == [1, 2]
    assert list(pf2) == []          # exhausted stays exhausted
    with pytest.raises(StopIteration):
        next(pf2)

    # context-manager form
    with DevicePrefetcher(itertools.count(), lambda x: x, depth=2) as pf3:
        assert next(pf3) == 0
    assert not pf3._t.is_alive()


def test_study_report_run_splitting_and_metrics(tmp_path):
    """tools/study_report.py: splits appended runs at step restarts,
    finds the sustained att transition (ignoring one-sample blips),
    summarizes loss/throughput."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import study_report

    events = []

    def scalar(tag, step, value):
        events.append({"kind": "scalar", "tag": tag, "step": step,
                       "value": value, "ts": 0.0})

    # run 0: att blips over 0.5 once at step 3, transitions for real at 6
    for step, (loss, att) in enumerate(
            [(9, .1), (8, .2), (7, .1), (6, .8), (5, .2), (4, .1),
             (3, .7), (2, .75), (1, .8), (1, .82)]):
        scalar("train/loss", step, loss)
        scalar("train/att_peak", step, att)
        scalar("train/steps_per_sec", step, 10.0)
    # run 1 (appended re-launch): step restarts, never transitions
    for step in range(4):
        scalar("train/loss", step, 5.0)
        scalar("train/att_peak", step, 0.1)
    d = tmp_path / "summary"
    d.mkdir()
    with open(d / "events.jsonl", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
        f.write('{"kind": "text", "tag": "train/sample", "step": 0, '
                '"value": "HYP", "ts": 0.0}\n')  # non-scalar rows skipped

    reports = study_report.main([str(d)])
    assert len(reports) == 2
    r0, r1 = reports
    assert r0["att_transition_step"] == 6
    assert r0["final_att_peak"] == pytest.approx(0.75, abs=0.1)
    assert r0["final_loss"] == pytest.approx(2.0, abs=1.1)
    assert r0["median_steps_per_sec"] == 10.0
    assert r1["att_transition_step"] is None
    assert r1["first_step"] == 0 and r1["last_step"] == 3


def test_stall_watchdog_fires_and_pets():
    """utils/watchdog.StallWatchdog: petting keeps it quiet, a stall
    fires on_stall once with the stalled duration, stop() disarms."""
    import threading
    import time

    from automatic_speech_recognition_tpu.utils.watchdog import (
        STALL_EXIT_CODE, StallWatchdog)

    assert STALL_EXIT_CODE == 17
    fired = threading.Event()
    seen = []

    wd = StallWatchdog(timeout_s=0.3, what="test progress",
                       on_stall=lambda s: (seen.append(s), fired.set()),
                       poll_s=0.05)
    wd.start()
    for _ in range(4):  # pet past several timeout windows: must stay quiet
        time.sleep(0.15)
        wd.pet()
    assert not fired.is_set()
    assert fired.wait(2.0)  # stop petting: fires
    assert seen and seen[0] > 0.3
    wd.stop()

    # stop() before the timeout disarms for good
    fired2 = threading.Event()
    wd2 = StallWatchdog(timeout_s=0.2, on_stall=lambda s: fired2.set(),
                        poll_s=0.05).start()
    wd2.stop()
    assert not fired2.wait(0.5)

    with pytest.raises(ValueError):
        StallWatchdog(timeout_s=0)


def test_wer_ci_single_and_paired(tmp_path):
    """tools/wer_ci.py: point estimate matches corpus_wer, CI covers it,
    the paired test calls an obvious improvement significant and an
    identical system not."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import wer_ci
    from automatic_speech_recognition_tpu.utils.text import corpus_wer

    rng = np.random.default_rng(0)
    words = ["ALPHA", "BRAVO", "CHARLIE", "DELTA", "ECHO", "FOX"]
    refs = [" ".join(rng.choice(words, 5)) for _ in range(60)]
    # system A: one substitution in ~half the utterances
    hyps_a = [r.split() for r in refs]
    for i in range(0, 60, 2):
        hyps_a[i][2] = "WRONG"
    hyps_a = [" ".join(h) for h in hyps_a]

    ref_f, a_f = str(tmp_path / "ref.txt"), str(tmp_path / "a.txt")
    open(ref_f, "w").write("\n".join(refs) + "\n")
    open(a_f, "w").write("\n".join(hyps_a) + "\n")

    res = wer_ci.main(["--ref", ref_f, "--hyp", a_f,
                       "--n_boot", "2000", "--json"])
    assert res["wer_a"] == pytest.approx(corpus_wer(refs, hyps_a))
    lo, hi = res["ci"]
    assert lo <= res["wer_a"] <= hi and hi > lo
    # deterministic under the same seed
    res2 = wer_ci.main(["--ref", ref_f, "--hyp", a_f,
                        "--n_boot", "2000", "--json"])
    assert res2["ci"] == [lo, hi]

    # paired vs the perfect system: significant, delta CI below zero
    b_f = str(tmp_path / "b.txt")
    open(b_f, "w").write("\n".join(refs) + "\n")
    res = wer_ci.main(["--ref", ref_f, "--hyp", a_f, "--hyp2", b_f,
                       "--n_boot", "2000", "--json"])
    assert res["wer_b"] == 0.0
    assert res["significant"] and res["delta_ci"][1] < 0
    assert res["p_value"] < 0.05

    # paired vs itself: delta exactly 0, never significant
    res = wer_ci.main(["--ref", ref_f, "--hyp", a_f, "--hyp2", a_f,
                       "--n_boot", "500", "--json"])
    assert res["delta"] == 0.0 and not res["significant"]
    assert res["p_value"] > 0.5

    # line-count mismatch fails loudly
    open(b_f, "w").write("\n".join(refs[:-1]) + "\n")
    with pytest.raises(ValueError, match="line"):
        wer_ci.main(["--ref", ref_f, "--hyp", a_f, "--hyp2", b_f,
                     "--n_boot", "100", "--json"])


def test_wer_ci_cer_mode(tmp_path):
    """--cer switches to character tokenization (spaces count, matching
    utils.text.corpus_cer)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import wer_ci
    from automatic_speech_recognition_tpu.utils.text import corpus_cer

    refs, hyps = ["AB CD", "EF GH"], ["AB CX", "EF GH"]
    ref_f, hyp_f = str(tmp_path / "r.txt"), str(tmp_path / "h.txt")
    open(ref_f, "w").write("\n".join(refs) + "\n")
    open(hyp_f, "w").write("\n".join(hyps) + "\n")
    res = wer_ci.main(["--ref", ref_f, "--hyp", hyp_f, "--cer",
                       "--n_boot", "200", "--json"])
    assert res["metric"] == "CER"
    assert res["wer_a"] == pytest.approx(corpus_cer(refs, hyps))


def test_transient_platform_error_classifier():
    """utils/platform.py: gRPC/backend failures classify as transient
    (supervisor retries, exit 18); real bugs do not."""
    from automatic_speech_recognition_tpu.utils.platform import (
        TRANSIENT_EXIT_CODE, exit_for_transient_errors,
        is_transient_platform_error)

    assert is_transient_platform_error(
        RuntimeError("UNAVAILABLE: TPU backend setup/compile error"))
    assert is_transient_platform_error(RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE"))
    assert is_transient_platform_error(
        RuntimeError("DEADLINE_EXCEEDED: RPC timed out"))
    # chained: outer generic wrapper, transient cause
    try:
        try:
            raise ConnectionError("Socket closed")
        except ConnectionError as inner:
            raise RuntimeError("step failed") from inner
    except RuntimeError as e:
        assert is_transient_platform_error(e)
    # real errors must NOT be retried
    assert not is_transient_platform_error(ValueError("bad --enc_units"))
    assert not is_transient_platform_error(
        FileNotFoundError("no training shards match"))

    # the CLI wrapper converts transient -> sys.exit(18), passes results
    # through, and re-raises real errors untouched
    assert exit_for_transient_errors(lambda argv: 42) == 42
    with pytest.raises(SystemExit) as exc:
        exit_for_transient_errors(
            lambda argv: (_ for _ in ()).throw(
                RuntimeError("UNAVAILABLE: tunnel died")))
    assert exc.value.code == TRANSIENT_EXIT_CODE
    with pytest.raises(ValueError):
        exit_for_transient_errors(
            lambda argv: (_ for _ in ()).throw(ValueError("bug")))


def test_train_supervised_retry_codes(tmp_path):
    """tools/train_supervised.sh: retries 17/18, stops on other codes,
    passes through success."""
    import subprocess
    script = "/root/repo/tools/train_supervised.sh"
    cnt = tmp_path / "count"

    # exits 18 twice, then succeeds -> supervisor exits 0 after 3 attempts
    worker = tmp_path / "worker.sh"
    worker.write_text(
        "#!/bin/bash\n"
        f"n=$(cat {cnt} 2>/dev/null || echo 0); n=$((n+1)); echo $n > {cnt}\n"
        "[ $n -ge 3 ] && exit 0\nexit 18\n")
    worker.chmod(0o755)
    env = dict(os.environ)
    r = subprocess.run(["bash", "-c",
                        f"sed 's/sleep \"$backoff\"/:/' {script} > "
                        f"{tmp_path}/fast.sh && bash {tmp_path}/fast.sh "
                        f"5 -- {worker}"],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode == 0, r.stderr
    assert cnt.read_text().strip() == "3"

    # a real error (rc 3) stops immediately with that code
    cnt.write_text("")
    bad = tmp_path / "bad.sh"
    bad.write_text("#!/bin/bash\nexit 3\n")
    bad.chmod(0o755)
    r = subprocess.run(["bash", f"{tmp_path}/fast.sh", "5", "--", str(bad)],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode == 3
    assert "non-retryable" in r.stderr


def test_train_supervised_planned_recycle(tmp_path):
    """Exit 21 (--recycle_after_steps, utils/memlog.RECYCLE_EXIT_CODE) is
    relaunched without consuming attempts or backoff: a worker that
    recycles 4 times under max_attempts=2 must still reach success."""
    import subprocess
    script = "/root/repo/tools/train_supervised.sh"
    cnt = tmp_path / "count"
    worker = tmp_path / "worker.sh"
    worker.write_text(
        "#!/bin/bash\n"
        f"n=$(cat {cnt} 2>/dev/null || echo 0); n=$((n+1)); echo $n > {cnt}\n"
        "[ $n -ge 5 ] && exit 0\nexit 21\n")
    worker.chmod(0o755)
    r = subprocess.run(
        ["bash", "-c",
         f"sed -e 's/sleep \"$backoff\"/:/' -e 's/sleep 2$/:/' {script} > "
         f"{tmp_path}/fast.sh && bash {tmp_path}/fast.sh 2 -- {worker}"],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert cnt.read_text().strip() == "5"
    assert r.stderr.count("planned recycle") == 4


def test_train_cli_recycle_after_steps(tmp_path, rng):
    """train.py --recycle_after_steps: checkpoints and exits 21 mid-run
    (utils/memlog.RECYCLE_EXIT_CODE, bounding the tunnel-client RSS
    leak documented in docs/OPERATIONS.md); a relaunch resumes from the
    recycle checkpoint to completion."""
    import subprocess
    import sys
    from automatic_speech_recognition_tpu.data.audio_io import write_wav
    root = str(tmp_path)
    dd = f"{root}/corpus/train/1/10"
    os.makedirs(dd)
    words = ["GO", "STOP", "LEFT", "RIGHT"]
    lines = []
    for u in range(6):
        uid = f"1-10-{u:04d}"
        lines.append(f"{uid} {' '.join(rng.choice(words, 2))}")
        write_wav(f"{dd}/{uid}.wav",
                  rng.standard_normal(int(16000 * 0.5)) * 0.1, 16000)
    with open(f"{dd}/1-10.trans.txt", "w") as f:
        f.write("\n".join(lines))
    flags = ["--unit", "char", "--feat_dim", "13",
             "--train_100hr_corpus_dir", f"{root}/corpus/train",
             "--train_360hr_corpus_dir", f"{root}/no360",
             "--train_500hr_corpus_dir", f"{root}/no500",
             "--dev_data_dir", f"{root}/nodev",
             "--test_data_dir", f"{root}/notest",
             "--feat_dir", f"{root}/feats", "--shard_dir", f"{root}/shards",
             "--save_dir", f"{root}/model", "--log_dir", f"{root}/log",
             "--summary_dir", f"{root}/sum",
             "--enc_units", "8", "--num_enc_channels", "4",
             "--num_enc_layers", "1", "--dec_units", "8",
             "--num_dec_layers", "1", "--embedding_size", "8",
             "--attention_size", "8", "--mode", "add",
             "--dropout_rate", "0.0", "--scheduled_sampling", "False",
             "--bucket_boundaries_train", "128",
             "--bucket_batch_sizes", "8",
             "--max_tokenlen_train", "16", "--maxlen", "128",
             "--epoch", "2", "--steps_per_epoch", "4"]
    import preprocess, create_shards
    preprocess.main(flags)
    create_shards.main(flags)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "/root/repo/train.py"] + flags
    r = subprocess.run(cmd + ["--recycle_after_steps", "3"],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 21, (r.returncode, r.stderr[-2000:])
    assert "recycle checkpoint saved" in r.stdout + r.stderr
    # relaunch without the flag finishes the remaining steps from the
    # recycle checkpoint (restore-or-init), exit 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, (r2.returncode, r2.stderr[-2000:])
    assert "restored epoch" in r2.stdout + r2.stderr


def test_error_analysis_alignment_and_counts(tmp_path):
    """tools/error_analysis.py: alignment op counts reproduce
    edit_distance, and the confusion tables count the right events."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import error_analysis
    from automatic_speech_recognition_tpu.utils.text import edit_distance

    # alignment agrees with edit_distance on random pairs
    rng = np.random.default_rng(0)
    vocab = list("ABCDE")
    for _ in range(30):
        r = [vocab[i] for i in rng.integers(0, 5, rng.integers(0, 8))]
        h = [vocab[i] for i in rng.integers(0, 5, rng.integers(0, 8))]
        ops = error_analysis.align(r, h)
        errs = sum(1 for k, *_ in ops if k != "ok")
        assert errs == edit_distance(r, h)[0]
        # alignment reconstructs both sequences
        assert [a for k, a, b in ops if a is not None] == r
        assert [b for k, a, b in ops if b is not None] == h

    refs = ["THE CAT SAT", "THE DOG RAN", "A CAT RAN"]
    hyps = ["THE CAT SAT", "THE DOG RAN FAST", "A BAT RAN"]
    rep = error_analysis.analyze(refs, hyps)
    assert rep["wer"] == pytest.approx(2 / 9)
    assert rep["top_substitutions"] == [(("CAT", "BAT"), 1)]
    assert rep["top_insertions"] == [("FAST", 1)]
    assert rep["top_deletions"] == []

    # CLI round trip with --json
    ref_f, hyp_f = str(tmp_path / "r.txt"), str(tmp_path / "h.txt")
    open(ref_f, "w").write("\n".join(refs) + "\n")
    open(hyp_f, "w").write("\n".join(hyps) + "\n")
    out = error_analysis.main(["--ref", ref_f, "--hyp", hyp_f, "--json"])
    assert out["wer"] == pytest.approx(2 / 9)
    short_f = str(tmp_path / "short.txt")
    open(short_f, "w").write(refs[0] + "\n")
    with pytest.raises(ValueError, match="line"):
        error_analysis.main(["--ref", ref_f, "--hyp", short_f])
