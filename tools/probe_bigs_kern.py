"""Quick on-chip probe: big-S recurrence alone, pallas vs XLA scan,
with tile-size / collect_true sensitivity.  Trimmed from ablate_bigs.py
to fit the relay's compile latency budget."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.models.linear import TSC
from prosper_tpu.ops.bigs_pallas import bigs_multi_pallas

C = 8192
S_BLOCK = 512
REPS = 10


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


def timeit(fn, *args, iters=2):
    g = chain(fn)
    out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / (iters * REPS)


def main():
    rng = np.random.default_rng(0)
    model = TSC(64, 32, 10, 5, chunk=C, s_block=S_BLOCK)
    sa = model.sa
    S = sa.states.shape[0]
    Hp = 10
    print(f"S={S}, Hp={Hp}, C={C}", flush=True)

    proj = jnp.asarray(rng.standard_normal((C, Hp)).astype(np.float32))
    Gf = jnp.asarray(rng.standard_normal((C, Hp * Hp)).astype(np.float32))
    S_pad = -(-S // S_BLOCK) * S_BLOCK
    pad = S_pad - S
    states_p = jnp.pad(jnp.asarray(sa.states, jnp.float32), ((0, pad), (0, 0)))
    outer_p = jnp.pad(jnp.asarray(sa.outer, jnp.float32), ((0, pad), (0, 0)))
    vcounts_p = jnp.pad(jnp.asarray(sa.value_counts, jnp.float32),
                        ((0, pad), (0, 0)))
    absst_p = jnp.pad(jnp.asarray(sa.abs_states, jnp.float32), ((0, pad),))
    log_odds = jnp.zeros((vcounts_p.shape[1],), jnp.float32) - 2.0
    prior = vcounts_p @ log_odds
    valid = (jnp.arange(S_pad) < S).astype(jnp.float32)

    # (tile, collect_true, exp_impl, s_block) — '_floor' replaces exp with a
    # multiply (measures the VPU-transcendental share: ~5%, NOT the wall);
    # the s_block sweep measures per-grid-step overhead amortisation
    # (400 steps at s_block=512 vs 112 at 2048)
    variants = [(512, False, "exp", 512), (512, False, "exp", 1024),
                (512, False, "exp", 2048), (1024, False, "exp", 1024)]
    if len(sys.argv) > 1:
        variants = []
        for a in sys.argv[1:]:
            parts = a.split(":")
            variants.append((int(parts[0]), bool(int(parts[1])),
                             parts[2] if len(parts) > 2 else "exp",
                             int(parts[3]) if len(parts) > 3 else S_BLOCK))
    for tile, ct, impl, sblk in variants:
            S_pad2 = -(-S // sblk) * sblk
            p2 = S_pad2 - S_pad
            def kern(proj, Gf, tile=tile, ct=ct, impl=impl, sblk=sblk,
                     p2=p2):
                pad2 = lambda a: (jnp.pad(a, ((0, p2),) + ((0, 0),) *  # noqa: E731
                                          (a.ndim - 1)) if p2 > 0
                                  else a[:S_pad2] if p2 < 0 else a)
                return bigs_multi_pallas(
                    proj, Gf, pad2(states_p), pad2(outer_p),
                    pad2(vcounts_p), pad2(prior),
                    pad2(valid) if p2 <= 0 else jnp.pad(valid, (0, p2)),
                    pad2(absst_p), 0.5, 0.9, 0.9, sblk,
                    tile=tile, collect_true=ct, exp_impl=impl)
            try:
                t = timeit(jax.jit(kern), proj, Gf)
                print(f"pallas tile={tile:4d} true={int(ct)} {impl:5s} "
                      f"sblk={sblk:4d}: {t*1e3:7.2f} ms/chunk "
                      f"({C/t/1e6:5.2f} M dp/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"pallas tile={tile:4d} true={int(ct)} {impl:5s} "
                      f"sblk={sblk:4d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
