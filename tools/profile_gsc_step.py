"""Device-trace profile of the FULL GSC EM step at the patches config.

Round 4 follow-up: BENCH_r04 has GSC at 5.2 M dp/s wall while the E-step
alone traces at 0.39 ms/chunk device (21 M dp/s, tools/profile_dtiled.py).
This tool traces the COMPLETE jit_step (E-step + Ncut mask + M-step incl.
the (H,H) solve + scalars) at N=131072 so the wall-vs-device gap is
attributed: device work would show up here; anything left is the
environment's per-dispatch relay cost.

Run solo on the live chip:  timeout 900 python tools/profile_gsc_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_dtiled import parse_trace

N = 131072
REPS = 5


def main():
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    from prosper_tpu.models.gsc import GSC

    model = GSC(256, 300, 6, 3, chunk=8192)
    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, model.D)).astype(np.float32)
    data = make_blank_data(y)
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)
    params = model.standard_init({"y": y[:256]}, seed=4)
    step = model.jit_step(saturated=True)

    p, F, s = step(params, data, sched, key)
    float(np.asarray(s["F_mean"]))
    data2 = dict(data, F_prev=F)

    # wall timing (same protocol as bench.py)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            p, F, s = step(p, data2, sched, key)
        float(np.asarray(s["F_mean"]))
        best = max(best, N * REPS / (time.perf_counter() - t0))
    per_step_ms = N / best * 1e3
    print(f"[gsc-step] wall: {best/1e6:.2f} M dp/s "
          f"({per_step_ms:.1f} ms/step at N={N})", flush=True)

    tracedir = "/tmp/trace_gsc_step"
    os.makedirs(tracedir, exist_ok=True)
    with jax.profiler.trace(tracedir):
        for _ in range(REPS):
            p, F, s = step(p, data2, sched, key)
        float(np.asarray(s["F_mean"]))
    parse_trace(tracedir, REPS)


if __name__ == "__main__":
    main()
