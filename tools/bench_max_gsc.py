"""Chunk-size sweep for the max-family and GSC E-steps on chip (round 2).

VERDICT r1 weak #1: MCA/GSC are 5-10x off the linear family and the
(chunk, S, D) winner-tile formulation was never profiled.  The cheapest
lever is the chunk size: bigger tiles amortize per-op overheads and give
XLA larger fusion regions (HBM working set at MCA chunk=2048, S=35, D=64:
~4 live (C,S,D) f32 tensors ~= 73 MB — fine).

Run: timeout 1600 python tools/bench_max_gsc.py [mca|gsc ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def measure(model, N, iters=5, groups=2):
    import jax
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal

    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, model.D)).astype(np.float32)
    data = make_blank_data(y)
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)
    params = model.standard_init({"y": y[:256]}, seed=4)

    step = model.jit_step()
    t0 = time.perf_counter()
    p, F, s = step(params, data, sched, key)
    float(np.asarray(s["F_mean"]))
    tc = time.perf_counter() - t0
    best = 0.0
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, F, s = step(p, dict(data, F_prev=F), sched, key)
        float(np.asarray(s["F_mean"]))
        best = max(best, N * iters / (time.perf_counter() - t0))
    return best, tc


def main():
    from prosper_tpu.models.gsc import GSC
    from prosper_tpu.models.mca import MCA

    which = set(a.lower() for a in sys.argv[1:]) or {"mca", "gsc"}
    N = 16384
    if "mca" in which:
        for chunk in (256, 1024, 4096):
            m = MCA(64, 100, 6, 3, chunk=chunk)
            dps, tc = measure(m, N)
            print(f"[mca chunk={chunk}] {dps/1e6:.2f} M dp/s "
                  f"(compile {tc:.0f}s)", flush=True)
    if "gsc" in which:
        for chunk in (2048, 8192):
            m = GSC(64, 100, 6, 3, chunk=chunk)
            dps, tc = measure(m, N)
            print(f"[gsc chunk={chunk}] {dps/1e6:.2f} M dp/s "
                  f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
