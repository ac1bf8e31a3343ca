"""Round-5 big-S device-time probe: the merged-GEMM scan (VERDICT r4 #4).

Measures the SATURATED production big-S E-step (collect_true=False, the
steady state bench.py measures) as device time per 8192-chunk, by timing
the jitted module over many chained chunks (wall at 128 chunks/dispatch
amortises the relay to <2%) — the apples-to-apples successor of the
round-4 0.73 ms/chunk figure (BASELINE.md "Big-S").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.core.etstep import linear_et_estep
from prosper_tpu.models.linear import TSC

C = 8192
REPS = 128


def main():
    rng = np.random.default_rng(0)
    model = TSC(64, 32, 10, 5, chunk=C, s_block=512)
    y = jnp.asarray(rng.standard_normal((C, model.D)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((model.D, model.H)).astype(np.float32))
    w = jnp.ones((C,), jnp.float32)
    lo = jnp.full((model.sa.values.shape[0],), -2.0, jnp.float32)

    # (tag, collect_true, pallas, s_block): scan baselines + the round-5
    # fully-folded kernel (bias/mask/mass in the GEMMs) at tile sweeps
    configs = [
        ("scan-sat-sb1024", False, False, 1024, 0),
        ("scan-ann-sb1024", True, False, 1024, 0),
        ("kern-sat-sb512-t512", False, True, 512, 512),
        ("kern-sat-sb512-t1024", False, True, 512, 1024),
        ("kern-sat-sb1024-t512", False, True, 1024, 512),
        ("kern-sat-sb1024-t1024", False, True, 1024, 1024),
        ("kern-ann-sb1024-t512", True, True, 1024, 512),
    ]
    if len(sys.argv) > 1:
        pick = sys.argv[1]
        configs = [c for c in configs if pick in c[0]]
    import prosper_tpu.ops.bigs_pallas as bp
    from functools import partial as _partial
    orig_kernel = bp.bigs_multi_pallas
    for tag, ct_flag, use_pallas, sb, tile in configs:
        # `linear_et_estep` imports bigs_multi_pallas from the module at
        # trace time, so rebinding the module attribute before tracing
        # sweeps the kernel's lane-tile width
        bp.bigs_multi_pallas = (_partial(orig_kernel, tile=tile)
                                if use_pallas else orig_kernel)

        @jax.jit
        def step(y, W, ct=ct_flag, sb=sb, pal=use_pallas):
            def body(carry, _):
                y_c = carry
                F, sums = linear_et_estep(
                    y_c, w, W, jnp.float32(1.0), lo, model.sa, 10,
                    model.signed_select, jnp.float32(1.0), jnp.float32(1.0),
                    C, s_block=sb, pallas_bigs=pal, collect_true=ct)
                bump = (jnp.sum(F) + jnp.sum(sums["xs"])) * 1e-30
                return y_c + bump, jnp.sum(F)
            yc, Fs = jax.lax.scan(body, y, None, length=REPS)
            return jnp.sum(Fs) + jnp.sum(yc) * 0.0

        try:
            out = step(y, W)
            jax.block_until_ready(out)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = step(y, W)
                float(np.asarray(out))
                best = min(best, (time.perf_counter() - t0) / REPS)
            print(f"[bigs-r5] {tag}: {best*1e3:.3f} ms/chunk "
                  f"({C/best/1e6:.2f} M dp/s)", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            print(f"[bigs-r5] {tag}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    bp.bigs_multi_pallas = orig_kernel


if __name__ == "__main__":
    main()
