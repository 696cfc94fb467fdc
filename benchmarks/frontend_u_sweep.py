"""One-off probe (round 4, VERDICT ask #8): does raising U — utterances
per grid step — close any of the fused frontend kernel's remaining
roofline gap?

Round-3 rework landed U=2 (bf16x4 DFT, parallel semantics) at ~2.1
ms/128-utt batch; minimal HBM traffic says ~0.13 ms, so the kernel is
grid/VPU-overhead-bound, not bandwidth-bound.  More utterances per grid
step amortizes per-step overhead (fewer grid steps, same math) at the
cost of VMEM: each extra utterance keeps its own frame block + output
block resident.  This sweeps U in {1, 2, 4, 8} on the production
variant; Mosaic rejects (VMEM overflow) are recorded as data.

Method: identical K-amplified min-min estimator as frontend_probe.py.
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

    for U in (1, 2, 4, 8):
        jax.clear_caches()
        try:
            t1s, tKs = [], []
            for _ in range(3):
                t1s.append(run(1, U)); tKs.append(run(5, U))
        except Exception as e:
            print(f"U={U}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        dt, spread = reduce_minmin(t1s, tKs, 5, what=f"u_sweep U={U}")
        print(f"U={U}: {dt*1e3:.2f} ms/batch (even/odd spread "
              f"{spread:.1f}%; {B/dt:.0f} utt/s, {dt/B*1e6:.1f} us/utt)",
              flush=True)


if __name__ == "__main__":
    main()
