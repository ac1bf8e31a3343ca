"""Stage ablation of the MCA E-step on chip (VERDICT r1 weak #1).

Times cumulative pipeline prefixes in isolation to locate where the
~2.4 M dp/s ceiling comes from.  Each stage is a separate jit whose output
is reduced to a scalar and fetched (the relay needs a host fetch to fence).

Run: timeout 900 python tools/ablate_max.py [chunk ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

from prosper_tpu.core import states as states_mod        # noqa: E402
from prosper_tpu.core.etstep import state_arrays_from    # noqa: E402
from prosper_tpu.core.maxstep import (_dp_winner_tile,   # noqa: E402
                                      _dp_hard_resp)
from prosper_tpu.core.select import top_hprime_candidates_dense  # noqa: E402

D, H, Hp, GAMMA = 64, 100, 6, 3
import os
N = int(os.environ.get("ABM_N", "131072"))


def timeit(name, fn, args, iters=10, chunk=None):
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
    chunks = [int(a) for a in sys.argv[1:]] or [1024]
    rng = np.random.default_rng(0)
    sa = state_arrays_from(states_mod.binary_state_space(Hp, GAMMA))
    states_np = np.asarray(sa.states)
    S = states_np.shape[0]
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    y_all = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    print(f"[ablate_max] D={D} H={H} Hp={Hp} S={S}", flush=True)

    for C in chunks:
        nch = N // C
        yc = y_all.reshape(nch, C, D)
        gram_diag = jnp.sum(W * W, axis=0)
        w_norm = jnp.sqrt(gram_diag)
        sa_states = jnp.asarray(sa.states)

        def scan_over(fn):
            def outer(yc):
                def body(acc, y):
                    return acc + fn(y), None
                return jax.lax.scan(body, jnp.float32(0.0), yc)[0]
            return outer

        def sel_stage(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
            Wc = jnp.dot(onehot.reshape(C * Hp, H), W.T,
                         preferred_element_type=jnp.float32).reshape(C, Hp, D)
            return jnp.sum(Wc)

        def winner_stage(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
            Wc = jnp.dot(onehot.reshape(C * Hp, H), W.T,
                         preferred_element_type=jnp.float32).reshape(C, Hp, D)
            tile, aux = _dp_winner_tile(Wc, states_np, False)
            return jnp.sum(tile["ybar"])

        def lik_stage(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
            Wc = jnp.dot(onehot.reshape(C * Hp, H), W.T,
                         preferred_element_type=jnp.float32).reshape(C, Hp, D)
            tile, aux = _dp_winner_tile(Wc, states_np, False)
            ybar = tile["ybar"]
            y_dot = jnp.einsum("nd,nsd->ns", y, ybar)
            ybar2 = jnp.sum(ybar * ybar, axis=2)
            lik_multi = y_dot - 0.5 * ybar2
            lik_single = P - 0.5 * gram_diag[None, :]
            logits = jnp.concatenate(
                [jnp.zeros((C, 1)), lik_single - 1.5,
                 lik_multi - 1.5 * sa.abs_states[None, :]], axis=1)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            return jnp.sum(p / jnp.sum(p, axis=1, keepdims=True))

        def resp_stage(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
            Wc = jnp.dot(onehot.reshape(C * Hp, H), W.T,
                         preferred_element_type=jnp.float32).reshape(C, Hp, D)
            tile, aux = _dp_winner_tile(Wc, states_np, False)
            ybar = tile["ybar"]
            y_dot = jnp.einsum("nd,nsd->ns", y, ybar)
            ybar2 = jnp.sum(ybar * ybar, axis=2)
            lik_multi = y_dot - 0.5 * ybar2
            m = jnp.max(lik_multi, axis=1, keepdims=True)
            q = jnp.exp(lik_multi - m)
            q = q / jnp.sum(q, axis=1, keepdims=True)
            A = _dp_hard_resp(q, aux[0], aux[1], Hp)
            return jnp.sum(A)

        def moments_stage(y):
            P = jnp.dot(y, W, preferred_element_type=jnp.float32)
            cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
            Wc = jnp.dot(onehot.reshape(C * Hp, H), W.T,
                         preferred_element_type=jnp.float32).reshape(C, Hp, D)
            tile, aux = _dp_winner_tile(Wc, states_np, False)
            ybar = tile["ybar"]
            y_dot = jnp.einsum("nd,nsd->ns", y, ybar)
            ybar2 = jnp.sum(ybar * ybar, axis=2)
            lik_multi = y_dot - 0.5 * ybar2
            m = jnp.max(lik_multi, axis=1, keepdims=True)
            q = jnp.exp(lik_multi - m)
            q = q / jnp.sum(q, axis=1, keepdims=True)
            A = _dp_hard_resp(q, aux[0], aux[1], Hp)
            denom = jnp.einsum("nah,nad->hd", onehot, A)
            numer = jnp.einsum("nah,nad->hd", onehot, A * y[:, None, :])
            return jnp.sum(denom) + jnp.sum(numer)

        print(f"-- chunk={C}", flush=True)
        timeit("sel+Wc", scan_over(sel_stage), (yc,))
        timeit("+winner DP", scan_over(winner_stage), (yc,))
        timeit("+likelihood/softmax", scan_over(lik_stage), (yc,))
        timeit("+hard_resp flow", scan_over(resp_stage), (yc,))
        timeit("+moment one-hots", scan_over(moments_stage), (yc,))


if __name__ == "__main__":
    main()
