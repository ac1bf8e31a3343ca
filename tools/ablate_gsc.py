"""Stage ablation of the GSC E-step on chip.

Cumulative pipeline prefixes, each its own jit with a fetched scalar, at a
batch size that amortises the fixed relay dispatch cost.

Run: timeout 1100 python tools/ablate_gsc.py [chunk ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

from prosper_tpu.core import states as states_mod        # noqa: E402
from prosper_tpu.core.etstep import state_arrays_from    # noqa: E402
from prosper_tpu.core.gscstep import (chol_bl, inverse_bl,  # noqa: E402
                                      logdet_bl, solve_bl)
from prosper_tpu.core.select import top_hprime_candidates_dense  # noqa: E402

D, H, Hp, GAMMA = 64, 100, 6, 3
N = 131072
SIGMA2, PSI, MU = 1.0, 1.0, 0.5


def timeit(name, fn, args, iters=5):
    jitted = jax.jit(fn)
    out = jitted(*args)
    float(np.asarray(out))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        float(np.asarray(out))
        best = max(best, N * iters / (time.perf_counter() - t0))
    print(f"{name:28s} {best/1e6:7.2f} M dp/s", flush=True)
    return best


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [4096]
    rng = np.random.default_rng(0)
    sa = state_arrays_from(states_mod.binary_state_space(Hp, GAMMA))
    act_np = np.asarray(sa.states > 0.5, np.float32)
    S = act_np.shape[0]
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    y_all = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    gram = W.T @ W
    gram_diag = jnp.diag(gram)
    w_norm = jnp.sqrt(gram_diag)
    print(f"[ablate_gsc] D={D} H={H} Hp={Hp} S={S}", flush=True)

    inv_s2 = 1.0 / SIGMA2
    inv_psi = 1.0 / PSI

    for C in chunks:
        nch = N // C
        yc = y_all.reshape(nch, C, D)

        def scan_over(fn):
            def outer(yc):
                def body(acc, y):
                    return acc + fn(y), None
                return jax.lax.scan(body, jnp.float32(0.0), yc)[0]
            return outer

        def select_part(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, True)
            proj = jnp.einsum("nah,nh->na", onehot, P)
            T = jnp.dot(onehot.reshape(C * Hp, H), gram,
                        preferred_element_type=jnp.float32).reshape(C, Hp, H)
            G = jnp.einsum("nak,nbk->nab", T, onehot)
            return proj, G, onehot, P

        def mats_part(proj, G):
            act_cols = [jnp.asarray(act_np[:, i]) for i in range(Hp)]
            B = C * S
            Mbl = [[None] * Hp for _ in range(Hp)]
            for i in range(Hp):
                for j in range(i + 1):
                    aij = act_cols[i] * act_cols[j]
                    e = (G[:, i, j] * inv_s2)[:, None] * aij[None, :]
                    if i == j:
                        e = e + (act_cols[i] * inv_psi
                                 + (1.0 - act_cols[i]))[None, :]
                    Mbl[i][j] = e.reshape(B)
            bbl = [(act_cols[i][None, :]
                    * (proj[:, i] * inv_s2 + MU * inv_psi)[:, None]
                    ).reshape(B) for i in range(Hp)]
            return Mbl, bbl

        def sel_stage(y):
            proj, G, onehot, P = select_part(y)
            return jnp.sum(G) + jnp.sum(proj)

        def build_stage(y):
            proj, G, onehot, P = select_part(y)
            Mbl, bbl = mats_part(proj, G)
            return sum(jnp.sum(v) for v in bbl) + jnp.sum(Mbl[Hp-1][0])

        def chol_stage(y):
            proj, G, onehot, P = select_part(y)
            Mbl, bbl = mats_part(proj, G)
            L = chol_bl(Mbl)
            return jnp.sum(logdet_bl(L))

        def solve_stage(y):
            proj, G, onehot, P = select_part(y)
            Mbl, bbl = mats_part(proj, G)
            L = chol_bl(Mbl)
            kap = solve_bl(L, bbl)
            bMb = sum(bbl[i] * kap[i] for i in range(Hp))
            return jnp.sum(logdet_bl(L)) + jnp.sum(bMb)

        def inverse_stage(y):
            proj, G, onehot, P = select_part(y)
            Mbl, bbl = mats_part(proj, G)
            L = chol_bl(Mbl)
            kap = solve_bl(L, bbl)
            Sig = inverse_bl(L)
            bMb = sum(bbl[i] * kap[i] for i in range(Hp))
            return (jnp.sum(logdet_bl(L)) + jnp.sum(bMb)
                    + sum(jnp.sum(Sig[i][i]) for i in range(Hp)))

        print(f"-- chunk={C}", flush=True)
        timeit("sel+G", scan_over(sel_stage), (yc,))
        timeit("+M/b build", scan_over(build_stage), (yc,))
        timeit("+cholesky", scan_over(chol_stage), (yc,))
        timeit("+solve+bMb", scan_over(solve_stage), (yc,))
        timeit("+inverse", scan_over(inverse_stage), (yc,))


if __name__ == "__main__":
    main()
