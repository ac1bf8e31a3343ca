"""On-chip bench of the D-tiled max-family kernel (round 4).

Patches config (D=256, H=300, Hp=6, gamma=3, S=35) where the resident
kernel does not fit VMEM and the XLA path measured 1.5 M dp/s (BENCH_r04
pre-kernel).  Sweeps (tile, d_block) and compares the XLA estep.

Run solo on the live chip:  python tools/bench_max_dtiled.py [mmca]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.core.etstep import state_arrays_from
from prosper_tpu.core.maxstep import max_et_estep
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.ops.max_pallas import max_et_estep_pallas_dtiled

C = 8192
REPS = 20


def chain(fn):
    def run(a, b):
        def body(carry, _):
            a_c, acc = carry
            out = fn(a_c, b)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return (a_c + bump, acc + bump), None
        (_, acc), _ = jax.lax.scan(body, (a, jnp.float32(0.0)), None,
                                   length=REPS)
        return acc
    return jax.jit(run)


def timeit(name, fn, *args, iters=3):
    try:
        g = chain(fn)
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / (iters * REPS)
        print(f"{name:36s} {dt*1e3:8.2f} ms/chunk ({C/dt/1e6:6.2f} M dp/s)",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:180]}",
              flush=True)
        return None


def main():
    magnitude = "mmca" in sys.argv[1:]
    D, H, Hp, gamma = 256, 300, 6, 3
    rng = np.random.default_rng(0)
    sa = state_arrays_from(binary_state_space(Hp, gamma))
    W = rng.standard_normal((D, H)).astype(np.float32)
    if not magnitude:
        W = np.abs(W)
    W = jnp.asarray(W)
    y = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    w = jnp.ones((C,), jnp.float32)
    lo = jnp.float32(np.log(0.02 / 0.98))
    s2 = jnp.float32(1.0)
    one = jnp.float32(1.0)
    print(f"max-family dtiled bench: D={D} H={H} Hp={Hp} S="
          f"{sa.states.shape[0]} magnitude={magnitude}", flush=True)

    def xla(y, W):
        return max_et_estep(y, w, W, s2, lo, sa, Hp, magnitude, one, one,
                            chunk=C)
    timeit("XLA estep (chunk=8192)", xla, y, W)

    for tile, dblk in ((512, 16), (256, 32), (256, 16), (128, 64),
                       (512, 32), (1024, 16)):
        def dt_fn(y, W, tile=tile, dblk=dblk):
            return max_et_estep_pallas_dtiled(
                y, w, W, s2, lo, sa, Hp, magnitude, one, one,
                tile=tile, d_block=dblk)
        timeit(f"dtiled Ct={tile} Dt={dblk}", dt_fn, y, W)

    # numerics cross-check at the winning config (on-chip, not interpret)
    def both(y, W):
        F1, s1 = xla(y, W)
        F2, s2_ = max_et_estep_pallas_dtiled(
            y, w, W, s2, lo, sa, Hp, magnitude, one, one)
        dF = jnp.max(jnp.abs(F1 - F2))
        ds = jnp.max(jnp.abs(s1["numer"] - s2_["numer"]))
        return dF, ds
    dF, ds = jax.jit(both)(y, W)
    print(f"on-chip max |dF|={float(dF):.3e} max |d numer|={float(ds):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
