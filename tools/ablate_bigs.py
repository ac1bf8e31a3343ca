"""Stage ablation for the big-S E-step (round 3; figures updated round 4).

Round-4 on-chip results (two solo runs, stable; S=12,564, C=8192):
  A.  pallas kernel alone   1.24-1.26 ms/chunk (6.5 M dp/s-equiv)
  A'. XLA scan alone        0.98-1.08 ms/chunk (7.6-8.4 M)
  B.  surroundings (1 blk)  0.91-0.95 ms/chunk
  C.  full estep XLA        1.27-1.28 ms/chunk (6.4 M)   <- faster backend
  C.  full estep pallas     1.43-1.48 ms/chunk (5.5-5.7 M)
Standalone A/B do NOT add up to C: the chained standalone harness carries
per-rep sync overhead.  The device trace (tools/profile_bigs.py) gives the
real split — full XLA step 0.73 ms/chunk DEVICE (11.2 M dp/s): 25-block
scan 0.50 ms, surroundings 0.23 ms; the wall gap is relay dispatch.  See
BASELINE.md "Big-S".  This probe splits one chunk's wall time into:

  A. the multi-state recurrence alone (pallas kernel vs XLA scan),
  B. everything AROUND it (candidate selection, Gram build, zero/singleton
     channel, combine, suff stats) — measured by shrinking S to one block,
  C. the full step (both backends), for cross-checking A+B.

Run on the live chip: python tools/ablate_bigs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prosper_tpu.models.linear import TSC

C = 8192
S_BLOCK = 512


REPS = 25   # chained inside ONE dispatch — the relay costs ~3 ms per call


def chain(fn):
    """fn(y-like, Gf-like) -> pytree; returns a jitted 10-rep chain where
    each rep's first input is perturbed by the previous output (serialises
    the reps without host round-trips)."""
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


def timeit(fn, *args, iters=3, warmup=1):
    g = chain(fn)
    for _ in range(warmup):
        out = g(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    jax.block_until_ready(out)
    # host fetch fences through the relay (bench.py timing note)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / (iters * REPS)


def main():
    rng = np.random.default_rng(0)
    model = TSC(64, 32, 10, 5, chunk=C, s_block=S_BLOCK)
    sa = model.sa
    S = sa.states.shape[0]
    Hp = 10
    print(f"S={S}, Hp={Hp}, C={C}, s_block={S_BLOCK}")

    y = jnp.asarray(rng.standard_normal((C, model.D)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((model.D, model.H)).astype(np.float32))

    # ---- A. recurrence alone -------------------------------------------
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

    from prosper_tpu.ops.bigs_pallas import bigs_multi_pallas

    @jax.jit
    def kern(proj, Gf):
        return bigs_multi_pallas(proj, Gf, states_p, outer_p, vcounts_p,
                                 prior, valid, absst_p,
                                 0.5, 0.9, 0.9, S_BLOCK)

    t_kern = timeit(kern, proj, Gf)
    print(f"A. pallas kernel alone:   {t_kern*1e3:7.2f} ms/chunk "
          f"({C/t_kern/1e6:5.2f} M dp/s-equiv)")

    # the XLA scan alone (same algebra as _chunk_estats_bigs's else branch)
    nblocks = S_pad // S_BLOCK
    xs = (states_p.reshape(nblocks, S_BLOCK, Hp),
          outer_p.reshape(nblocks, S_BLOCK, Hp * Hp),
          vcounts_p.reshape(nblocks, S_BLOCK, vcounts_p.shape[1]),
          absst_p.reshape(nblocks, S_BLOCK),
          prior.reshape(nblocks, S_BLOCK),
          valid.reshape(nblocks, S_BLOCK))

    @jax.jit
    def scan(proj, Gf):
        f32 = jnp.float32
        neg = jnp.float32(-3e38)
        K = vcounts_p.shape[1]

        def body(carry, xb):
            m, l, m_t, l_t, a_s, a_ss, a_vc, a_abs = carry
            st_b, ot_b, vc_b, ab_b, pr_b, va_b = xb
            lik = (2.0 * jnp.dot(proj, st_b.T, preferred_element_type=f32)
                   - jnp.dot(Gf, ot_b.T, preferred_element_type=f32)) * 0.5
            logits = 0.9 * lik + 0.9 * pr_b[None, :]
            logits = jnp.where(va_b[None, :] > 0, logits, neg)
            m_new = jnp.maximum(m, jnp.max(logits, axis=1))
            r = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[:, None])
            l = l * r + jnp.sum(p, axis=1)
            a_s = a_s * r[:, None] + jnp.dot(p, st_b, preferred_element_type=f32)
            a_ss = (a_ss * r[:, None]
                    + jnp.dot(p, ot_b, preferred_element_type=f32))
            a_vc = (a_vc * r[:, None]
                    + jnp.dot(p, vc_b, preferred_element_type=f32))
            a_abs = a_abs * r + jnp.dot(p, ab_b, preferred_element_type=f32)
            logits_t = jnp.where(va_b[None, :] > 0, lik + pr_b[None, :], neg)
            m_tn = jnp.maximum(m_t, jnp.max(logits_t, axis=1))
            l_t = (l_t * jnp.exp(m_t - m_tn)
                   + jnp.sum(jnp.exp(logits_t - m_tn[:, None]), axis=1))
            return (m_new, l, m_tn, l_t, a_s, a_ss, a_vc, a_abs), None

        init = (jnp.full((C,), neg), jnp.zeros((C,), f32),
                jnp.full((C,), neg), jnp.zeros((C,), f32),
                jnp.zeros((C, Hp), f32), jnp.zeros((C, Hp * Hp), f32),
                jnp.zeros((C, K), f32), jnp.zeros((C,), f32))
        out, _ = jax.lax.scan(body, init, xs)
        return out

    t_scan = timeit(scan, proj, Gf)
    print(f"A'. XLA scan alone:       {t_scan*1e3:7.2f} ms/chunk "
          f"({C/t_scan/1e6:5.2f} M dp/s-equiv)")

    # ---- B. everything around the recurrence ---------------------------
    small = TSC(64, 32, 10, 2, chunk=C, s_block=S_BLOCK)  # S small (1 block)
    Ssmall = small.sa.states.shape[0]
    print(f"B config: gamma=2 -> S={Ssmall} "
          f"({-(-Ssmall // S_BLOCK)} block(s))")

    from prosper_tpu.core.etstep import linear_et_estep

    w = jnp.ones((C,), jnp.float32)

    def stepper(m, pallas_bigs, collect_true=True):
        lo = jnp.full((m.sa.values.shape[0],), -2.0, jnp.float32)

        def f(y, W):
            return linear_et_estep(
                y, w, W, jnp.float32(1.0), lo, m.sa, Hp, m.signed_select,
                jnp.float32(0.9), jnp.float32(0.9), C,
                s_block=S_BLOCK, pallas_bigs=pallas_bigs,
                collect_true=collect_true)
        return jax.jit(f)

    big = TSC(64, 32, 10, 5, chunk=C, s_block=S_BLOCK)
    for name, m, pb, ct in (
            ("B. around (gamma=2, 1 blk) ", small, False, True),
            ("C. full estep xla          ", big, False, True),
            ("C. full estep pallas       ", big, True, True),
            ("D. full xla, saturated     ", big, False, False),
            ("D. full pallas, saturated  ", big, True, False)):
        try:
            f = stepper(m, pb, ct)
            t = timeit(f, y, W)
            print(f"{name}: {t*1e3:7.2f} ms/chunk ({C/t/1e6:5.2f} M dp/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e!r}")


if __name__ == "__main__":
    main()
