"""Ablation timing of the BSC E-step at bench scale on the real chip.

Times each pipeline stage in isolation to locate the bottleneck
(GEMMs should dominate; if masks/top_k/scatters do, those get rewritten).
Run alone — no other TPU-attached process may be live.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.core.etstep import linear_et_estep, state_arrays_from
from prosper_tpu.core.select import (
    exact_count_mask,
    global_quantile_threshold,
    top_hprime_candidates,
)
from prosper_tpu.core.states import discrete_state_space

D, H, Hp, GAMMA = 256, 300, 8, 4
N, CHUNK = 131072, 8192


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms   ({N/dt/1e6:8.2f} M dp/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    ones = jnp.ones((N,), jnp.float32)
    space = discrete_state_space(Hp, GAMMA, [1.0])
    sa = state_arrays_from(space)
    log_odds = jnp.asarray([np.log(2.0 / H / (1 - 2.0 / H))], jnp.float32)
    key = jax.random.PRNGKey(0)
    S = space.S
    print(f"N={N} D={D} H={H} Hp={Hp} S={S} chunk={CHUNK}\n")

    # full E-step
    f_estep = jax.jit(lambda y_: linear_et_estep(
        y_, ones, W, jnp.float32(1.0), log_odds, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), chunk=CHUNK))
    timeit("full linear_et_estep", f_estep, y)

    # stage: projection GEMM
    f_P = jax.jit(lambda y_: jnp.dot(y_, W, preferred_element_type=jnp.float32))
    timeit("P = y @ W", f_P, y)
    P = f_P(y)

    # stage: top_k candidates
    wn = jnp.linalg.norm(W, axis=0)
    f_topk = jax.jit(lambda P_: top_hprime_candidates(P_, wn, Hp, False))
    timeit("top_k candidates", f_topk, P)
    cand = f_topk(P)

    # stage: gathers
    gram = W.T @ W
    f_gather = jax.jit(lambda P_, c: (
        jnp.take_along_axis(P_, c, axis=1),
        gram[c[:, :, None], c[:, None, :]]))
    timeit("proj + gram gathers", f_gather, P, cand)
    proj, G = f_gather(P, cand)

    # stage: state logits GEMMs + softmax
    def logits_fn(proj_, G_):
        Gf = G_.reshape(N, Hp * Hp)
        lik = (2.0 * proj_ @ sa.states.T - Gf @ sa.outer.T) * 0.5
        logits = jnp.concatenate(
            [jnp.zeros((N, 1)), P * 1.0, lik], axis=1)
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        return p / jnp.sum(p, axis=1, keepdims=True)
    f_logits = jax.jit(logits_fn)
    timeit("state logits + softmax", f_logits, proj, G)
    q = f_logits(proj, G)
    q_multi = q[:, 1 + H:]
    q_single = q[:, 1:1 + H]

    # stage: suff-stat GEMMs
    f_sgemm = jax.jit(lambda qm: (qm @ sa.states, qm @ sa.outer))
    timeit("q @ states / q @ outer", f_sgemm, q_multi)
    s_cand, ss_cand = f_sgemm(q_multi)

    # stage: scatters
    def scatter_fn(sc, ssc, c):
        rows = jnp.arange(N, dtype=jnp.int32)[:, None] * H
        s_full = (q_single.reshape(-1).at[(rows + c).reshape(-1)]
                  .add(sc.reshape(-1)).reshape(N, H))
        idx2 = (c[:, :, None] * H + c[:, None, :]).reshape(-1)
        ss = jnp.zeros((H * H,)).at[idx2].add(ssc.reshape(-1)).reshape(H, H)
        return s_full, ss
    f_scatter = jax.jit(scatter_fn)
    timeit("s_full + ssT scatters", f_scatter, s_cand, ss_cand, cand)
    s_full, _ = f_scatter(s_cand, ss_cand, cand)

    # stage: xs GEMM
    f_xs = jax.jit(lambda s: jnp.dot(y.T, s, preferred_element_type=jnp.float32))
    timeit("xs = y.T @ s_full", f_xs, s_full)

    # masks (currently always-on in the step)
    f_mask = jax.jit(lambda k: exact_count_mask(k, N, jnp.float32(1.0)))
    timeit("exact_count_mask (sort)", f_mask, key)
    f_q = jax.jit(lambda F_: global_quantile_threshold(
        F_, ones, jnp.float32(N), None))
    timeit("quantile histogram", f_q, jnp.asarray(rng.standard_normal(N),
                                                  jnp.float32))


if __name__ == "__main__":
    main()
