"""Probe XLA-side flat 1-D gather / scatter-add throughput on chip (round 2).

Decides the two-pass E-step kernel architecture (VERDICT r1 item #2):
kernel A emits per-datapoint candidate indices; XLA gathers the (Hp,Hp)
Gram submatrix entries flat from gram.ravel(); kernel B consumes them and
emits the small covariance correction, which XLA flat-scatter-adds into the
(H,H) sufficient statistic.  Viable iff gather+scatter of N*Hp^2 = 8.4M
elements costs ~1 ms, i.e. roughly HBM-bandwidth-bound (round-1 profiling
showed *mixed-broadcast* scatters are pathological but flat 1-D forms were
fine at small scale — this measures the real scale).

Timing: on-device fori_loop with a carried data dependence (block_until_ready
through the axon relay does not reliably fence pallas/XLA work, and a scalar
fetch costs ~40 ms — amortize one fetch over ITERS loop steps).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

N, Hp, H = 131072, 8, 304
ITERS = 30

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal(H * H), jnp.float32)
idx = jnp.asarray(rng.integers(0, H * H, size=(N * Hp * Hp,)), jnp.int32)
vals = jnp.asarray(rng.standard_normal(N * Hp * Hp), jnp.float32)
cand = jnp.asarray(rng.integers(0, H, size=(N, Hp)), jnp.int32)


def timed(name, carry0, step):
    g = jax.jit(lambda c: jax.lax.fori_loop(0, ITERS, lambda i, c: step(c), c))
    try:
        t0 = time.perf_counter()
        out = g(carry0)
        s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = g(carry0)
        s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"[{name}] {dt*1e3:.3f} ms/iter (compile {tc:.0f}s, dep={s:.3g})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] FAIL {repr(e)[:200]}", flush=True)


# gather 8.4M f32 from a 92k table (loop-carried offset defeats hoisting)
timed("gather_flat", jnp.float32(0.0),
      lambda x: x + 1e-30 * jnp.sum(jnp.take(table + x, idx)))

# scatter-add 8.4M f32 into 92k bins
timed("scatter_flat", jnp.zeros(H * H, jnp.float32),
      lambda acc: jnp.zeros(H * H, jnp.float32).at[idx].add(
          vals + 1e-30 * acc[0]))

# pair-index build from (N, Hp) candidates: c_a*H + c_b -> (N*Hp*Hp,)
def pairs(x):
    c = cand + jnp.int32(0 * x)
    p = (c[:, :, None] * H + c[:, None, :]).reshape(N * Hp * Hp)
    return x + 1e-30 * jnp.float32(jnp.sum(p % 7))
timed("pair_idx_build", jnp.float32(0.0), pairs)

# fused realistic: build pairs, gather, reduce
def fused(x):
    c = cand + jnp.int32(0 * x)
    p = (c[:, :, None] * H + c[:, None, :]).reshape(N * Hp * Hp)
    return x + 1e-30 * jnp.sum(jnp.take(table, p))
timed("pairs_then_gather", jnp.float32(0.0), fused)

# reference point: one-hot GEMM gather of the same information in XLA
def onehot(x):
    oh = jax.nn.one_hot(cand, H, dtype=jnp.float32)        # (N, Hp, H)
    T = jnp.einsum("nah,hk->nak", oh + x * 0, table.reshape(H, H))
    G = jnp.einsum("nak,nbk->nab", T, oh)
    return x + 1e-30 * jnp.sum(G)
timed("onehot_gemm_ref", jnp.float32(0.0), onehot)
