"""Round-3 verify drive: canonical bars recipe + on-chip max-family kernel.

Runs on the real TPU chip. Three stages:
 1. canonical BSC bars run (the /verify recipe) — 10/10 bars expected
 2. MCA backend='pallas' on-chip: Mosaic compile + one-step numerics vs XLA
 3. quick MCA/MMCA throughput probe (pallas vs xla)
"""
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np


def stage1():
    from prosper_tpu import EM, LinearAnnealing
    from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
    from prosper_tpu.models import BSC

    model = BSC(D=25, H=10, Hprime=6, gamma=3)
    gt = bars_gt_params(model, intensity=10.0, sigma=2.0)
    data = model.generate_data(gt, 1000, seed=11)
    anneal = LinearAnnealing(60)
    anneal["T"] = [(0.0, 2.0), (0.7, 1.0)]
    anneal["Ncut_factor"] = [(0.0, 0.0), (0.5, 0.0), (0.9, 1.0)]
    anneal["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
    em = EM(model, anneal, {"y": data["y"]}, seed=5)
    params = em.run()
    n = count_recovered_bars(np.asarray(params["W"]), np.asarray(gt["W"]),
                             0.85)
    print(f"[stage1] bars recovered: {n}/10  pi={float(params['pi']):.3f} "
          f"sigma={float(params['sigma']):.3f}", flush=True)
    assert n == 10


def stage23():
    import jax
    import jax.numpy as jnp
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    from prosper_tpu.models.mca import MCA, MMCA

    D_, H_, Hp_, g_ = 64, 100, 6, 3
    rng = np.random.default_rng(2)
    yw = np.abs(rng.standard_normal((256, D_)).astype(np.float32))
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)

    for cls in (MCA, MMCA):
        name = cls.__name__.lower()
        y_eq = rng.standard_normal((16384, D_)).astype(np.float32)
        if cls is MCA:
            y_eq = np.abs(y_eq)
        data_eq = make_blank_data(y_eq)
        outs = {}
        for backend in ("pallas", "xla"):
            m = cls(D_, H_, Hp_, g_, chunk=8192, backend=backend)
            params = m.standard_init({"y": yw}, seed=4)
            t0 = time.perf_counter()
            p, F, s = m.jit_step()(params, data_eq, sched, key)
            jax.block_until_ready(F)
            float(np.asarray(s["F_mean"]))
            print(f"[stage2] {name}/{backend} compiled+ran "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            outs[backend] = {**{k: np.asarray(v) for k, v in p.items()},
                             "F_sum": np.asarray(s["F_total"])}
        max_rel = 0.0
        for k in outs["pallas"]:
            a, b = outs["pallas"][k], outs["xla"][k]
            rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))
            max_rel = max(max_rel, rel)
        print(f"[stage2] {name} pallas-vs-xla max_rel={max_rel:.3g}",
              flush=True)
        assert max_rel <= 1e-4, f"{name} backends disagree: {max_rel}"

        # stage 3: quick throughput probe at the bench batch
        N = 262144
        yb = rng.standard_normal((N, D_)).astype(np.float32)
        if cls is MCA:
            yb = np.abs(yb)
        data_b = make_blank_data(yb)
        for backend in ("pallas", "xla"):
            m = cls(D_, H_, Hp_, g_, chunk=8192, backend=backend)
            params = m.standard_init({"y": yw}, seed=4)
            step = m.jit_step()
            p, F, s = step(params, data_b, sched, key)
            float(np.asarray(s["F_mean"]))
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(3):
                    p, F, s = step(p, data_b, sched, key)
                float(np.asarray(s["F_mean"]))
                best = max(best, 3 * N / (time.perf_counter() - t0))
            print(f"[stage3] {name}/{backend}: {best / 1e6:.2f}M dp/s",
                  flush=True)


if __name__ == "__main__":
    stage1()
    stage23()
    print("[drive] ALL OK", flush=True)
