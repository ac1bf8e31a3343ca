"""Diagnose the patches-scale run_scanned pace (round 4).

The 5-seed recovery run measured ~4-5 s/iter at N=1e6 while the direct
jit_step bench implies ~0.08 s/iter (12 M dp/s).  This probe times the
pieces separately on the real chip:

  1. direct jit_step calls at N=1e6 (chained, like bench.py)
  2. em.run_scanned(10) segments, with and without revival enabled
  3. em.run(10) python-loop iterations

Run solo on the live chip:  python tools/probe_scanned.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models import BSC

D, H, Hp, GAMMA = 256, 300, 8, 4
N = 999_424          # 122 x 8192 (chunk multiple)


def main():
    import jax
    rng = np.random.default_rng(0)
    model = BSC(D, H, Hp, GAMMA, chunk=8192)
    y = rng.standard_normal((N, D)).astype(np.float32)
    params0 = model.standard_init({"y": y[:65536]}, seed=1)

    # 1. direct chained steps (the bench path) at N=1e6
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    data = make_blank_data(y)
    sched = sched_from_anneal(LinearAnnealing(10))
    step = model.jit_step(saturated=True)
    key = jax.random.PRNGKey(0)
    p, F, s = step(dict(params0), data, sched, key)
    float(np.asarray(s["F_mean"]))
    data2 = dict(data, F_prev=F)
    t0 = time.perf_counter()
    for _ in range(5):
        p, F, s = step(p, data2, sched, key)
    float(np.asarray(s["F_mean"]))
    dt = (time.perf_counter() - t0) / 5
    print(f"[1] direct jit_step:          {dt*1e3:8.0f} ms/iter "
          f"({N/dt/1e6:.1f} M dp/s)", flush=True)

    # 2a. run_scanned, no revival
    for label, revive in (("no revival", None),
                          ("revival(10,...)", (10, 0.85, 0.75, 0.1))):
        anneal = LinearAnnealing(40)
        em = EM(model, anneal, {"y": y}, params=dict(params0), seed=3,
                revive_duplicates=revive,
                reseed_worst_frac=0.02 if revive else 0.0,
                split_norm_frac=1.5 if revive else 0.0,
                split_coact=bool(revive))
        em.run_scanned(10)           # warmup/compile
        t0 = time.perf_counter()
        em.run_scanned(10)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        em.run_scanned(10)
        dt2 = time.perf_counter() - t0
        print(f"[2] run_scanned {label:16s}: {dt1/10*1e3:8.0f} / "
              f"{dt2/10*1e3:.0f} ms/iter", flush=True)

    # 3. python loop
    anneal = LinearAnnealing(8)
    em = EM(model, anneal, {"y": y}, params=dict(params0), seed=3)
    em.step_once()                   # compile
    t0 = time.perf_counter()
    for _ in range(5):
        em.step_once()
    dt = (time.perf_counter() - t0) / 5
    print(f"[3] em.step_once loop:        {dt*1e3:8.0f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
