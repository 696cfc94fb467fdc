"""Data augmentation: speed and volume perturbation.

The reference shells out to sox per file (`sox in.flac out.flac speed 0.9`,
utils/augmentation.py:6-31), re-rendering the whole corpus to disk.  The
TPU-native equivalent is a resampler applied to the waveform in memory —
sox's `speed` effect IS a sample-rate change (pitch and tempo shift
together), i.e. reading the signal at `speed` times the original rate.

Implemented as linear-interpolation resampling (NumPy for the host
preprocessing path, jnp-compatible math), plus the volume scaler the
reference has but keeps commented out (utils/augmentation.py:33-56,
README.md:26).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def speed_perturb(signal: np.ndarray, speed: float) -> np.ndarray:
    """Resample so the utterance plays `speed` times faster (sox `speed`).

    Output length = floor(len / speed); linear interpolation between
    neighbouring samples.
    """
    n_out = int(len(signal) / speed)
    pos = np.arange(n_out) * speed
    i0 = np.minimum(pos.astype(np.int64), len(signal) - 1)
    i1 = np.minimum(i0 + 1, len(signal) - 1)
    frac = pos - i0
    return ((1.0 - frac) * signal[i0] + frac * signal[i1]).astype(signal.dtype)


def volume_perturb(signal: np.ndarray, vol: float) -> np.ndarray:
    """Scale amplitude by `vol` with clipping to [-1, 1] (sox `vol` semantics
    for the reference's commented-out VolumeAugmentation)."""
    return np.clip(signal * vol, -1.0, 1.0).astype(signal.dtype)


SPEED_LIST = (0.9, 1.1)  # reference: preprocess.py:160


def speed_augment_all(signals: Sequence[np.ndarray],
                      speed: float) -> List[np.ndarray]:
    return [speed_perturb(s, speed) for s in signals]
