"""Speed-augmented shards must actually flow into a training run:
preprocess --augmentation writes speed_{0.9,1.1}_train-* feature dumps
(reference: preprocess.py:158-167), create_shards packs them into the
train-*.arsh series, and train.py consumes the enlarged set."""

import glob
import os

import numpy as np
import pytest

from automatic_speech_recognition_tpu.data.audio_io import write_wav
from automatic_speech_recognition_tpu.data.shards import get_num_records

WORDS = ["GO", "STOP", "LEFT", "RIGHT", "UP", "DOWN"]


@pytest.fixture
def corpus(tmp_path, rng):
    root = str(tmp_path)
    dd = f"{root}/corpus/train/1/10"
    os.makedirs(dd)
    lines = []
    for u in range(6):
        uid = f"1-10-{u:04d}"
        lines.append(f"{uid} {' '.join(rng.choice(WORDS, 2))}")
        write_wav(f"{dd}/{uid}.wav",
                  rng.standard_normal(int(16000 * 0.5)) * 0.1, 16000)
    with open(f"{dd}/1-10.trans.txt", "w") as f:
        f.write("\n".join(lines))
    return root


def test_augmented_shards_flow_into_training(corpus, monkeypatch):
    root = corpus
    monkeypatch.chdir(root)
    flags = ["--unit", "char", "--feat_dim", "13", "--augmentation", "True",
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
             "--max_tokenlen_train", "16", "--maxlen", "128"]
    import preprocess, create_shards
    import train as train_cli

    preprocess.main(flags)
    aug = sorted(glob.glob(f"{root}/feats/speed_*-feats*.npy"))
    assert len(aug) == 2, aug  # speed_0.9 and speed_1.1 dumps
    create_shards.main(flags)
    files = sorted(glob.glob(f"{root}/shards/train-*.arsh"))
    # 6 original + 6 + 6 augmented records across the train shard series
    assert get_num_records(files) == 18
    train_cli.main(flags + ["--epoch", "1", "--steps_per_epoch", "2"])
    assert os.path.exists(f"{root}/model")


# ---------------------------------------------------------------------------
# SpecAugment (on-device, ops/augmentation.py:spec_augment)
# ---------------------------------------------------------------------------

def test_spec_augment_masks_within_bounds():
    import jax
    import jax.numpy as jnp
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.ops.augmentation import spec_augment

    cfg = Config(spec_augment=True, sa_freq_masks=2, sa_freq_width=3,
                 sa_time_masks=2, sa_time_width=10, sa_time_ratio=0.5)
    B, T, D = 4, 64, 13
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T, D, 3)), jnp.float32)
    audiolen = jnp.asarray([64, 40, 16, 8], jnp.int32)
    out = spec_augment(jax.random.PRNGKey(3), audio, audiolen, cfg)
    assert out.shape == audio.shape
    zeroed = np.asarray(out == 0.0)
    changed = np.asarray(out != audio)
    for b in range(B):
        # something was masked (widths can draw 0, but with 4 masks the
        # all-zero draw is vanishingly rare at this seed — assert loosely)
        n = int(audiolen[b])
        # time-masked frames are fully zeroed across every bin+channel
        # (freq masks can cover at most 2*3=6 of 13 rows, so a fully-
        # changed frame can only come from a time mask)
        tcols = np.nonzero(changed[b].all(axis=(1, 2)))[0]
        # every time-masked frame lies inside the utterance (freq masks
        # legitimately touch padding frames; real padding is zero anyway)
        assert (tcols < n).all(), (b, tcols, n)
        # time-mask widths respect the per-utterance ratio cap: each mask
        # <= min(10, 0.5*n), two masks max
        assert len(set(tcols)) <= 2 * min(10, int(0.5 * n))
        # all changed positions are zeroed, never perturbed
        assert np.all(zeroed[b][changed[b]])
    # a different key gives different masks
    out2 = spec_augment(jax.random.PRNGKey(4), audio, audiolen, cfg)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))
    # same key is deterministic
    out3 = spec_augment(jax.random.PRNGKey(3), audio, audiolen, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3))


def test_spec_augment_train_step_and_eval_isolation(rng):
    """--spec_augment True trains (finite, decreasing loss) and never
    touches the eval path (las_forward is is_training-gated upstream)."""
    import jax
    from automatic_speech_recognition_tpu.config import Config
    from automatic_speech_recognition_tpu.models import las
    from automatic_speech_recognition_tpu.training import trainer

    cfg = Config(unit="char", vocab_size=30, feat_dim=8, enc_type="cnn",
                 enc_units=16, num_enc_channels=4, num_enc_layers=1,
                 dec_units=16, num_dec_layers=1, embedding_size=8,
                 attention_size=8, mode="add", dropout_rate=0.0,
                 scheduled_sampling=False, apply_bn=False,
                 label_smoothing=False, lr=5e-3,
                 spec_augment=True, sa_freq_width=2, sa_time_width=4)
    audio = rng.standard_normal((4, 32, 8, 3)).astype(np.float32)
    audiolen = np.full((4,), 32, np.int32)
    ys = rng.integers(3, 29, (4, 8)).astype(np.int32)
    ys[:, -1] = 2
    yslen = np.full((4,), 8, np.int32)
    batch = (audio, audiolen, ys, yslen)
    ts = trainer.create_train_state(jax.random.PRNGKey(0), cfg)
    losses = []
    for _ in range(30):
        ts, m = trainer.train_step(ts, batch, cfg, dec_steps=8)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses[::10]
    # eval forward ignores spec_augment (identical logits with/without)
    params, bn = ts.params, ts.bn_state
    a, _, _, _, _ = las.las_forward(params, bn, audio, audiolen, cfg,
                                    dec_steps=8, is_training=False)
    b, _, _, _, _ = las.las_forward(
        params, bn, audio, audiolen, cfg.replace(spec_augment=False),
        dec_steps=8, is_training=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
