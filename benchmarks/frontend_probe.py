"""Probe: where does the fused Pallas frontend's time go?  (run on TPU)

The kernel computes ~41 MFLOP/utt; at v5e rates that is ~2-6 us of
MXU+VPU work, yet the measured kernel costs ~42 us/utt (5.38 ms / 128).
Candidates: grid-step overhead, DMA not overlapped (dimension_semantics
"arbitrary" forbids reordering), small-matmul inefficiency (g=80 lanes).

Times the production kernel vs variants via the same K-amplification
method as decoder_profile.py (dispatch floor cancels).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from automatic_speech_recognition_tpu.utils.platform import honor_platform_env
honor_platform_env()
import jax
import jax.numpy as jnp

from automatic_speech_recognition_tpu.ops import pallas_frontend as pk
from automatic_speech_recognition_tpu.utils.kamp import reduce_minmin

SR, SEC, B, D = 16000, 10.0, 128, 13
FL, FS, NFFT, NMEL = 400, 160, 512, 40


def timed(fn, n=3):
    float(jax.device_get(fn()))
    vals = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jax.device_get(fn()))
        vals.append(time.perf_counter() - t0)
    return float(np.median(vals))


def main():
    rng = np.random.default_rng(0)
    S = int(SEC * SR)
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((B, S)) * 0.1, jnp.float32))
    frames = (S - FL) // FS + 1
    featlen = jnp.full((B,), frames, jnp.int32)

    # K-amplification at the jnp level: serialize via scalar carry
    def run(k, U):
        @jax.jit
        def f(a):
            def it(i, acc):
                g = pk.fused_frontend(
                    a + acc * 1e-30, featlen, flen=FL, fstride=FS,
                    fft_length=NFFT, feat_dim=D, feat_type="mfcc",
                    num_mel_filters=NMEL, sample_rate=SR,
                    frames_max=frames, apply_cmvn=True, utts_per_step=U)
                return acc + jnp.sum(g)
            return jax.lax.fori_loop(0, k, it, 0.0)
        return timed(lambda: f(audio))

    # The tunneled chip is time-shared: device time itself varies ~25%
    # between windows.  Each variant therefore gets 3 paired (t1, tK)
    # measurements; min estimates the uncontended kernel time, the
    # min..max spread shows the contention envelope.  The variant axis
    # reproduces the A/Bs the kernel comments cite (pallas_frontend.py
    # module flags): production bf16x4/parallel vs f32 DFT, FOLDED
    # merged-matmul form, and "arbitrary" dimension semantics.
    variants = [
        ("prod bf16x4/parallel", "parallel", False, True),
        ("f32 DFT", "parallel", False, False),
        ("folded merged-matmul", "parallel", True, False),
        ("arbitrary semantics", "arbitrary", False, True),
    ]
    for name, sem, folded, bf16x4 in variants:
        for U in (1, 2):
            pk._SEMANTICS, pk._FOLDED, pk._BF16X4 = sem, folded, bf16x4
            jax.clear_caches()  # module flags are not jit cache keys
            try:
                t1s, tKs = [], []
                for _ in range(3):
                    t1s.append(run(1, U)); tKs.append(run(5, U))
            except Exception as e:  # VMEM overflow / Mosaic reject: record
                print(f"{name} U={U}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            dt, spread = reduce_minmin(t1s, tKs, 5,
                                       what=f"frontend_probe {name} U={U}")
            print(f"{name} U={U}: {dt*1e3:.2f} ms/batch "
                  f"(min-min est, even/odd spread {spread:.1f}%; "
                  f"{B/dt:.0f} utt/s, {dt/B*1e6:.1f} us/utt)", flush=True)
    pk._SEMANTICS, pk._FOLDED, pk._BF16X4 = "parallel", False, True


if __name__ == "__main__":
    main()
