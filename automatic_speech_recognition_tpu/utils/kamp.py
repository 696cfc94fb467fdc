"""K-amplified timing reduction shared by the benchmarks.

Every device bench in this repo times a kernel as (t_K - t_1)/(K - 1)
over paired windows (the dispatch floor on the tunneled platform cancels
in the difference; see bench.py's module docstring).  The difference can
come out zero or NEGATIVE when the t_1 window lands on a more contended
slice of the time-shared chip than the t_K window — the old absolute
timing could not go negative, so each caller needs this guard before
dividing by dt (advisor finding r3: a negative min yields nonsense utt/s
and spread).
"""

from __future__ import annotations

import sys

import numpy as np


def reduce_dts(dts, reducer: str = "min", what: str = "bench"):
    """Reduce paired K-amplified samples to (dt_seconds, spread_pct).

    Drops non-positive samples (contention inversion between the paired
    windows) with a stderr warning; if every sample inverted, returns the
    absolute magnitude of the least-negative one so the caller still
    reports a finite, obviously-suspect number rather than dividing by
    zero or printing a negative throughput.
    """
    dts = np.asarray(list(dts), dtype=np.float64)
    good = dts[dts > 0]
    if good.size < dts.size:
        print(f"{what}: dropped {dts.size - good.size}/{dts.size} "
              "non-positive K-amplified samples (t_1 window more "
              "contended than t_K)", file=sys.stderr)
    if good.size == 0:
        good = np.asarray([max(float(np.abs(dts).min()), 1e-9)])
        print(f"{what}: ALL K-amplified samples non-positive; reporting "
              "|least-negative| — treat this run as unusable",
              file=sys.stderr)
    dt = float(good.min() if reducer == "min" else np.median(good))
    spread = float((good.max() - good.min()) / dt) * 100.0
    return dt, spread


def reduce_minmin(t1s, tKs, K: int, what: str = "bench"):
    """Unbiased K-amplified reduction: dt = (min tK - min t1)/(K - 1).

    Contention on the time-shared chip is strictly ADDITIVE on each
    absolute timing, so min-over-windows of t1 and tK separately
    estimate the uncontended times; differencing PAIRED windows instead
    lets t1's noise enter with negative sign and biases the min of the
    differences downward (bench.py measured 36-155% spread that way,
    with "best" windows that were artifacts).  Spread = relative gap
    between the same estimator computed on the even and odd window
    subsets — the stability of the reported number.  Falls back to the
    guarded paired reduction when even the min-min difference inverts.
    """
    t1s = np.asarray(list(t1s), dtype=np.float64)
    tKs = np.asarray(list(tKs), dtype=np.float64)

    def est(sel):
        return (tKs[sel].min() - t1s[sel].min()) / (K - 1)

    dt = float(est(slice(None)))
    if dt <= 0:
        return reduce_dts((tKs - t1s) / (K - 1), reducer="min",
                          what=f"{what} (min-min inverted; paired fallback)")
    if min(len(t1s), len(tKs)) >= 2:
        halves = [est(slice(0, None, 2)), est(slice(1, None, 2))]
        spread = abs(halves[0] - halves[1]) / dt * 100.0
    else:
        spread = float("nan")
    return dt, spread
