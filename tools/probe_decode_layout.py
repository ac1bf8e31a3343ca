"""Probe: fix the decode's DUS layout pathology (round 3, VERDICT #3).

jax.profiler showed lax.map's stacked s_mean buffer gets layout {1,0,2}
(feature-major), making each chunk's dynamic-update-slice a partial-tile
RMW (5.1 ms/131k alone).  Variants measured on chip:

  v0_map        current: lax.map, s_mean (C,H), recon (C,D)
  v1_mapT       body returns s_mean/recon TRANSPOSED ((H,C)/(D,C), the
                GEMM's natural output layout); transpose once outside
  v2_unroll     python-unrolled chunks + one concatenate (no while loop)
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from prosper_tpu.core.select import top_hprime_candidates_dense
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.core.etstep import LinearStateArrays

D, H, Hp, GAMMA = 256, 300, 8, 4
N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
f32 = jnp.float32

rng = np.random.default_rng(0)
W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
sigma2 = jnp.float32(1.0)
pi = 2.0 / H
log_odds = jnp.asarray([np.log(pi) - np.log1p(-pi)], np.float32)
space = binary_state_space(Hp, GAMMA)
sa = LinearStateArrays(*(jnp.asarray(a) for a in
                         (space.states, space.outer, space.abs_states,
                          space.value_counts, space.values)))
gram = jnp.dot(W.T, W, preferred_element_type=f32)
gram_diag = jnp.diagonal(gram)


def core_q(y_i):
    C = y_i.shape[0]
    inv2s2 = 0.5 / sigma2
    P = jnp.dot(y_i, W, preferred_element_type=f32)
    w_norm = jnp.sqrt(jnp.maximum(gram_diag, 1e-30))
    cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
    proj = jnp.einsum("nah,nh->na", onehot, P)
    T = jnp.dot(onehot.reshape(C * Hp, H), gram,
                preferred_element_type=f32).reshape(C, Hp, H)
    G = jnp.einsum("nak,nbk->nab", T, onehot)
    Gf = G.reshape(C, Hp * Hp)
    lik_multi = (2.0 * jnp.dot(proj, sa.states.T, preferred_element_type=f32)
                 - jnp.dot(Gf, sa.outer.T, preferred_element_type=f32)) * inv2s2
    v = sa.values
    lik_single = (2.0 * P[:, :, None] * v[None, None, :]
                  - gram_diag[None, :, None] * (v ** 2)[None, None, :]) * inv2s2
    logits = jnp.concatenate(
        [jnp.zeros((C, 1), f32),
         (lik_single + log_odds[None, None, :]).reshape(C, H),
         lik_multi + (sa.value_counts @ log_odds)[None, :]], axis=1)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    Z = jnp.sum(p, axis=1, keepdims=True)
    q = p / Z
    y2 = jnp.sum(y_i * y_i, axis=1)
    F = ((m + jnp.log(Z))[:, 0] - y2 * inv2s2
         - 0.5 * D * jnp.log(2.0 * jnp.pi * sigma2))
    return q, onehot, F


def body_v0(y_i):
    q, onehot, F = core_q(y_i)
    C = y_i.shape[0]
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_mean = q_single + jnp.einsum("na,nah->nh", s_cand, onehot)
    recon = jnp.dot(s_mean, W.T, preferred_element_type=f32)
    return {"F": F, "s_mean": s_mean, "recon": recon}


def body_v1(y_i):
    q, onehot, F = core_q(y_i)
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_meanT = q_single.T + jnp.einsum("na,nah->hn", s_cand, onehot)
    reconT = jnp.dot(W, s_meanT, preferred_element_type=f32)   # (D, C)
    return {"F": F, "s_meanT": s_meanT, "reconT": reconT}


def run_map(body):
    nc = N // chunk
    yc = y.reshape(nc, chunk, D)
    return jax.lax.map(body, yc)

def v0():
    out = run_map(body_v0)
    return {k: v.reshape((N,) + v.shape[2:]) for k, v in out.items()}

def v1():
    out = run_map(body_v1)
    # (nc, H, chunk) -> (H, N) -> transpose once -> (N, H)
    sm = jnp.swapaxes(out["s_meanT"], 0, 1).reshape(H, N).T
    rc = jnp.swapaxes(out["reconT"], 0, 1).reshape(D, N).T
    return {"F": out["F"].reshape(N), "s_mean": sm, "recon": rc}

def v2():
    nc = N // chunk
    outs = [body_v0(y[i*chunk:(i+1)*chunk]) for i in range(nc)]
    return {k: jnp.concatenate([o[k] for o in outs], axis=0)
            for k in outs[0]}


def timeit(fn, iters=8):
    f = jax.jit(fn)
    out = f()
    float(np.asarray(out["F"][0]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        float(np.asarray(out["F"][0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


r0 = timeit(v0)
print(f"v0_map    {r0:8.2f} ms/{N}  ({N/r0*1e3/1e6:.2f} M dp/s)")
r1 = timeit(v1)
print(f"v1_mapT   {r1:8.2f} ms/{N}  ({N/r1*1e3/1e6:.2f} M dp/s)")
r2 = timeit(v2)
print(f"v2_unroll {r2:8.2f} ms/{N}  ({N/r2*1e3/1e6:.2f} M dp/s)")
# numerics check v1 vs v0
a, b = jax.jit(v0)(), jax.jit(v1)()
print("s_mean max diff:", float(jnp.max(jnp.abs(a["s_mean"]-b["s_mean"]))))
