"""Robust TPU timing helper for probes: difference of per-size minima.

min over tries of t(r2) minus min over tries of t(r1) is robust to
one-sided tunnel hiccups (a slow r1 inflates a paired difference, but
not the separate minima).
"""

import time


def timeit(fn, *args, r1=64, r2=512, tries=4):
    """Seconds per rep for the marginal workload (r2 - r1 reps)."""
    _ = float(fn(*args, r1))
    _ = float(fn(*args, r2))
    t1s, t2s = [], []
    for _i in range(tries):
        t0 = time.perf_counter()
        _ = float(fn(*args, r1))
        t1 = time.perf_counter()
        _ = float(fn(*args, r2))
        t2 = time.perf_counter()
        t1s.append(t1 - t0)
        t2s.append(t2 - t1)
    return max(min(t2s) - min(t1s), 1e-9) / (r2 - r1)
