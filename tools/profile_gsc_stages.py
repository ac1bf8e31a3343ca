"""Round 5 (VERDICT r4 #8): attribute GSC's non-E-step device time.

The round-4 dtiled trace measured the GSC E-step at 0.39 ms/chunk device
(21 M dp/s) while the full-step bench lands at ~12.7 M — BASELINE.md said
"M-step + mask + dispatch overhead around a fast E-step" without a split.
This tool times, at the bench config (D=256 H=300 Hp=6 gamma=3,
chunk=8192, N=131072), each stage of the FULL step as its own jitted
chained loop (64 reps amortise the relay):

  estep      — estep_sums over the resident data (the hot loop)
  mask       — noisify + partial/Ncut weight construction
  mstep      — finalize_mstep (psum-free single device) from fixed sums
  full       — the production jit_step

The difference full - (estep + mask + mstep) is scheduling/fusion overlap
(negative = stages overlap inside the full step).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.models.base import make_blank_data, sched_from_anneal
from prosper_tpu.models.gsc import GSC

N, CHUNK = 131072, 8192
# REPS is the in-jit scan length; the per-dispatch relay/launch latency is
# amortised 1/REPS, so at REPS=10 a ~25 ms relay round-trip masquerades as
# ~2.5 ms/stage (the round-5 first cut of this table mis-attributed exactly
# that to the mask/M-step stages).  Default higher + report the measured
# floor from an empty loop.
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


def main():
    rng = np.random.default_rng(0)
    model = GSC(256, 300, 6, 3, chunk=CHUNK)
    y = jnp.asarray(rng.standard_normal((N, 256)).astype(np.float32))
    data = make_blank_data(y)
    params = model.standard_init({"y": np.asarray(y[:4096])}, seed=1)
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)
    w = jnp.ones((N,), jnp.float32)

    @jax.jit
    def estep_loop(params, y):
        def body(c, _):
            F, sums = model.estep_sums(params, y, w, sched, saturated=True)
            return c + jnp.sum(F) * 1e-30, jnp.sum(F)
        c, Fs = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + jnp.sum(Fs)

    @jax.jit
    def mask_loop(params, data):
        def body(c, _):
            p = model.noisify(params, sched, key)
            wgt, logA, logB, Nt = model.et_weight_mask(
                model.log_pi_active(p), data, sched, key, None)
            return c + jnp.sum(wgt) * 1e-30, jnp.sum(wgt)
        c, ws = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + jnp.sum(ws)

    # fixed sums for the pure M-step timing
    F0, sums0 = jax.jit(lambda p, y: model.estep_sums(p, y, w, sched,
                                                      saturated=True))(
        params, y)
    jax.block_until_ready(sums0)

    @jax.jit
    def mstep_loop(params, sums):
        def body(c, _):
            newp, scal = model.finalize_mstep(params, sums, jnp.float32(N))
            return c + scal["F_mean"] * 1e-30, scal["F_mean"]
        c, fs = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + jnp.sum(fs)

    # dispatch floor: a scan of the same length whose body is one trivial op
    @jax.jit
    def empty_loop(c0):
        def body(c, _):
            return c + 1e-30 * c, c
        c, cs = jax.lax.scan(body, c0, None, length=REPS)
        return c + jnp.sum(cs) * 0.0

    full = model.jit_step(saturated=True)

    @jax.jit
    def full_loop(params, data):
        def body(carry, _):
            p, d = carry
            p2, F, scal = full(p, d, sched, key)
            return (p2, dict(d, F_prev=F)), scal["F_mean"]
        (p, d), fs = jax.lax.scan(body, (params, data), None, length=REPS)
        return jnp.sum(fs) + jnp.sum(p["W"]) * 0.0

    t_0 = timeit(empty_loop, jnp.float32(1.0))
    t_e = timeit(estep_loop, params, y)
    t_m = timeit(mask_loop, params, data)
    t_s = timeit(mstep_loop, params, sums0)
    t_f = timeit(full_loop, params, data)
    print(f"[gsc-stages] REPS={REPS} dispatch floor {t_0*1e3:7.3f} ms/rep "
          f"({t_0*REPS*1e3:.1f} ms/dispatch)")
    for tag, t in [("estep", t_e), ("mask ", t_m), ("mstep", t_s),
                   ("full ", t_f)]:
        net = t - t_0
        rate = f" ({N/net/1e6:5.1f} M dp/s net)" if tag in ("estep", "full ") \
            else ""
        print(f"[gsc-stages] {tag} {t*1e3:7.2f} ms raw | {net*1e3:7.2f} ms "
              f"net{rate}")
    print(f"[gsc-stages] full - (e+m+s) net: "
          f"{(t_f - t_e - t_m - t_s + 2 * t_0)*1e3:+.2f} ms")


if __name__ == "__main__":
    main()
