"""Probe part 2: full compact decode with transposed/reshaped outputs."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from prosper_tpu.core.select import top_hprime_candidates_dense, top_l_argmax
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.core.etstep import LinearStateArrays

D, H, Hp, GAMMA, L = 256, 300, 8, 4, 10
N = 131072
chunk = 8192
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
S = space.states.shape[0]


def core(y_i):
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
    lik_single = (2.0 * P - gram_diag[None, :]) * inv2s2
    logits = jnp.concatenate(
        [jnp.zeros((C, 1), f32), lik_single + log_odds[0],
         lik_multi + (sa.value_counts @ log_odds)[None, :]], axis=1)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    Z = jnp.sum(p, axis=1, keepdims=True)
    q = p / Z
    y2 = jnp.sum(y_i * y_i, axis=1)
    F = ((m + jnp.log(Z))[:, 0] - y2 * inv2s2
         - 0.5 * D * jnp.log(2.0 * jnp.pi * sigma2))
    return q, cand, onehot, F


def smallT(q, cand, onehot):
    """Top-L fields, transposed (dp last)."""
    C = q.shape[0]
    top_q, top_u = top_l_argmax(q, L)
    u = top_u - 1
    is_single = (u >= 0) & (u < H)
    sh = jnp.where(is_single, u, 0)
    sv = jnp.where(is_single, 1.0, 0.0)
    s_idx = jnp.clip(u - H, 0, S - 1)
    is_multi = u >= H
    su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
    mcv = jnp.dot(su.reshape(C * L, S), sa.states,
                  preferred_element_type=f32).reshape(C, L, Hp)
    return top_q, sh, sv, mcv, cand


def body_v0(y_i):
    q, cand, onehot, F = core(y_i)
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_mean = q_single + jnp.einsum("na,nah->nh", s_cand, onehot)
    recon = jnp.dot(s_mean, W.T, preferred_element_type=f32)
    top_q, sh, sv, mcv, cand = smallT(q, cand, onehot)
    return {"F": F, "s_mean": s_mean, "recon": recon, "top_probs": top_q,
            "unit": sh, "val": sv, "mcv": mcv, "cand": cand}


def body_v1(y_i):
    """Transposed bigs; small tensors transposed with .T / transpose."""
    q, cand, onehot, F = core(y_i)
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_meanT = q_single.T + jnp.einsum("na,nah->hn", s_cand, onehot)
    reconT = jnp.dot(W, s_meanT, preferred_element_type=f32)
    top_q, sh, sv, mcv, cand = smallT(q, cand, onehot)
    return {"F": F, "s_meanT": s_meanT, "reconT": reconT,
            "top_probsT": top_q.T, "unitT": sh.T, "valT": sv.T,
            "mcvT": jnp.transpose(mcv, (1, 2, 0)), "candT": cand.T}


def body_v2(y_i):
    """Transposed bigs; small tensors packed flat (C, width)."""
    q, cand, onehot, F = core(y_i)
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_meanT = q_single.T + jnp.einsum("na,nah->hn", s_cand, onehot)
    reconT = jnp.dot(W, s_meanT, preferred_element_type=f32)
    top_q, sh, sv, mcv, cand = smallT(q, cand, onehot)
    small = jnp.concatenate(
        [top_q, sh.astype(f32), sv, mcv.reshape(-1, L * Hp),
         cand.astype(f32)], axis=1)          # (C, 10+10+10+80+8=118)
    return {"F": F, "s_meanT": s_meanT, "reconT": reconT, "small": small}


def run(body, tkeys=(), iters=8):
    nc = N // chunk
    yc = y.reshape(nc, chunk, D)

    def f():
        out = jax.lax.map(body, yc)
        res = {}
        for k, v in out.items():
            if k in tkeys:
                v = jnp.moveaxis(v, 0, -2)
                v = v.reshape(v.shape[:-2] + (N,))
                res[k] = jnp.moveaxis(v, -1, 0)
            else:
                res[k] = v.reshape((N,) + v.shape[2:])
        return res
    jf = jax.jit(f)
    out = jf()
    float(np.asarray(out["F"][0]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf()
        float(np.asarray(out["F"][0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


r0 = run(body_v0)
print(f"v0 current    {r0:8.2f} ms  ({N/r0*1e3/1e6:.2f} M dp/s)")
r1 = run(body_v1, tkeys=("s_meanT", "reconT", "top_probsT", "unitT",
                         "valT", "mcvT", "candT"))
print(f"v1 all-T      {r1:8.2f} ms  ({N/r1*1e3/1e6:.2f} M dp/s)")
r2 = run(body_v2, tkeys=("s_meanT", "reconT"))
print(f"v2 T+packed   {r2:8.2f} ms  ({N/r2*1e3/1e6:.2f} M dp/s)")
