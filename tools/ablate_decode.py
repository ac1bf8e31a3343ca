"""Stage ablation for the serving decode path (ROUND2 'decode mystery').

The train E-step runs ~12 ms/131k at the patches config while the decode
(`model.inference`) runs ~62 ms/131k, and an earlier core-q probe suggested
even the shared q computation was 2.6x slower inside the decode program.
This tool times the decode with stages peeled off, on the real chip, with
forced host sync (the relay does not fence on block_until_ready):

  estep        train E-step, XLA path (reference point)
  q_only       decode chunk up to q + F (no moments, no top-L)
  no_topl      q + s_mean + recon + F (no top-L extraction)
  topq_only    ... + top-L probabilities (argmax passes) but no top_states
  full         the production decode

Usage: python tools/ablate_decode.py [N] [chunk]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from prosper_tpu.core import etstep
from prosper_tpu.core.etstep import LinearStateArrays, chunked_decode
from prosper_tpu.core.select import top_hprime_candidates_dense, top_l_argmax
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.models.linear import BSC

D, H, Hp, GAMMA = 256, 300, 8, 4
TOP_L = 10


def decode_chunk_staged(y, W, gram, gram_diag, sigma2, log_odds, sa, stage):
    f32 = jnp.float32
    N = y.shape[0]
    Hh = W.shape[1]
    K = sa.values.shape[0]
    S = sa.states.shape[0]
    inv2s2 = 0.5 / sigma2
    P = jnp.dot(y, W, preferred_element_type=f32)
    w_norm = jnp.sqrt(jnp.maximum(gram_diag, 1e-30))
    cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp, False)
    proj = jnp.einsum("nah,nh->na", onehot, P)
    T = jnp.dot(onehot.reshape(N * Hp, Hh), gram,
                preferred_element_type=f32).reshape(N, Hp, Hh)
    G = jnp.einsum("nak,nbk->nab", T, onehot)
    Gf = G.reshape(N, Hp * Hp)
    lik_multi = (2.0 * jnp.dot(proj, sa.states.T, preferred_element_type=f32)
                 - jnp.dot(Gf, sa.outer.T, preferred_element_type=f32)) * inv2s2
    prior_multi = sa.value_counts @ log_odds
    logits_multi = lik_multi + prior_multi[None, :]
    v = sa.values
    lik_single = (2.0 * P[:, :, None] * v[None, None, :]
                  - gram_diag[None, :, None] * (v ** 2)[None, None, :]) * inv2s2
    logits_single = (lik_single + log_odds[None, None, :]).reshape(N, Hh * K)
    logits = jnp.concatenate(
        [jnp.zeros((N, 1), f32), logits_single, logits_multi], axis=1)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    Z = jnp.sum(p, axis=1, keepdims=True)
    q = p / Z
    y2 = jnp.sum(y * y, axis=1)
    log_p0 = -jnp.log1p(jnp.sum(jnp.exp(log_odds)))
    F = ((m + jnp.log(Z))[:, 0] - y2 * inv2s2
         - 0.5 * D * jnp.log(2.0 * jnp.pi * sigma2) + Hh * log_p0)
    if stage == "q_only":
        return {"F": F, "qs": jnp.sum(q, axis=1)}

    q_single = q[:, 1:1 + Hh * K].reshape(N, Hh, K)
    q_multi = q[:, 1 + Hh * K:]
    s_cand = jnp.dot(q_multi, sa.states, preferred_element_type=f32)
    s_mean = (q_single @ v) + jnp.einsum("na,nah->nh", s_cand, onehot)
    recon = jnp.dot(s_mean, W.T, preferred_element_type=f32)
    if stage == "no_topl":
        return {"F": F, "s_mean": s_mean, "recon": recon}

    top_q, top_u = top_l_argmax(q, TOP_L)
    if stage == "topq_only":
        return {"F": F, "s_mean": s_mean, "recon": recon, "top_probs": top_q}

    u = top_u - 1
    is_single = (u >= 0) & (u < Hh * K)
    sh = jnp.where(is_single, u // K, 0)
    sv = jnp.where(is_single, v[jnp.clip(u % K, 0, K - 1)], 0.0)
    single_vec = jax.nn.one_hot(sh, Hh, dtype=f32) * sv[..., None]
    single_vec = single_vec * is_single[..., None]
    s_idx = jnp.clip(u - Hh * K, 0, S - 1)
    is_multi = u >= Hh * K
    multi_cand_vals = (sa.states[s_idx] * is_multi[..., None])
    multi_vec = jnp.einsum("nla,nah->nlh", multi_cand_vals, onehot)
    top_states = single_vec + multi_vec
    return {"F": F, "s_mean": s_mean, "recon": recon,
            "top_probs": top_q, "top_states": top_states}


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sigma2 = jnp.float32(1.0)
    pi = 2.0 / H
    log_odds = jnp.asarray([np.log(pi) - np.log1p(-pi)], np.float32)
    space = binary_state_space(Hp, GAMMA)
    sa = LinearStateArrays(
        states=jnp.asarray(space.states), outer=jnp.asarray(space.outer),
        abs_states=jnp.asarray(space.abs_states),
        value_counts=jnp.asarray(space.value_counts),
        values=jnp.asarray(space.values))

    def timeit(fn, sync, iters=8):
        out = fn()
        sync(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    # reference point: the train E-step (XLA path)
    model = BSC(D, H, Hp, GAMMA, chunk=chunk, backend="xla")
    params = {"W": W, "pi": jnp.float32(pi), "sigma": jnp.float32(1.0)}
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    data = make_blank_data(np.asarray(y))
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)
    step = model.jit_step()
    ms = timeit(lambda: step(params, data, sched, key),
                lambda o: float(np.asarray(o[2]["F_mean"])))
    print(f"estep(xla)   {ms:8.2f} ms/{N}  ({N/ms*1e3/1e6:.2f} M dp/s)")

    gram = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
    gram_diag = jnp.diagonal(gram)
    for stage in ("q_only", "no_topl", "topq_only", "full"):
        f = jax.jit(lambda yy, st=stage: chunked_decode(
            lambda yi: decode_chunk_staged(
                yi, W, gram, gram_diag, sigma2, log_odds, sa, st), yy, chunk))
        ms = timeit(lambda: f(y), lambda o: float(np.asarray(o["F"][0])))
        print(f"{stage:12s} {ms:8.2f} ms/{N}  ({N/ms*1e3/1e6:.2f} M dp/s)")

    # the production inference for comparison
    model2 = BSC(D, H, Hp, GAMMA, chunk=chunk)
    ms = timeit(lambda: model2.inference(params, {"y": y}, top_L=TOP_L),
                lambda o: float(np.asarray(o["F"][0])))
    print(f"{'production':12s} {ms:8.2f} ms/{N}  ({N/ms*1e3/1e6:.2f} M dp/s)")




def topstates_variants(y, W, gram, gram_diag, sigma2, log_odds, sa, variant,
                       Hp_=8):
    """Isolate the top_states construction cost centers (timing only)."""
    f32 = jnp.float32
    N = y.shape[0]
    Hh = W.shape[1]
    K = sa.values.shape[0]
    S = sa.states.shape[0]
    P = jnp.dot(y, W, preferred_element_type=f32)
    w_norm = jnp.sqrt(jnp.maximum(gram_diag, 1e-30))
    cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp_, False)
    # fake q: cheap but data-dependent
    q = jax.nn.softmax(P[:, :1 + Hh * K + S] if P.shape[1] >= 1 + Hh*K + S
                       else jnp.pad(P, ((0, 0), (0, 1 + Hh*K + S - P.shape[1]))),
                       axis=1)
    top_q, top_u = top_l_argmax(q, TOP_L)
    u = top_u - 1
    v = sa.values
    is_single = (u >= 0) & (u < Hh * K)
    F = P[:, 0]
    if variant == "baseline":
        return {"F": F, "top_probs": top_q}
    if variant == "single_only":
        sh = jnp.where(is_single, u // K, 0)
        sv = jnp.where(is_single, v[jnp.clip(u % K, 0, K - 1)], 0.0)
        single_vec = jax.nn.one_hot(sh, Hh, dtype=f32) * sv[..., None]
        single_vec = single_vec * is_single[..., None]
        return {"F": F, "ts": single_vec}
    if variant == "gather_only":
        s_idx = jnp.clip(u - Hh * K, 0, S - 1)
        mcv = sa.states[s_idx]
        return {"F": F, "g": jnp.sum(mcv, axis=-1)}
    if variant == "multi_gather":
        s_idx = jnp.clip(u - Hh * K, 0, S - 1)
        is_multi = u >= Hh * K
        mcv = sa.states[s_idx] * is_multi[..., None]
        multi_vec = jnp.einsum("nla,nah->nlh", mcv, onehot)
        return {"F": F, "ts": multi_vec}
    if variant == "multi_onehot":
        s_idx = jnp.clip(u - Hh * K, 0, S - 1)
        is_multi = u >= Hh * K
        su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
        mcv = jnp.dot(su.reshape(N * TOP_L, S), sa.states,
                      preferred_element_type=f32).reshape(N, TOP_L, Hp_)
        multi_vec = jnp.einsum("nla,nah->nlh", mcv, onehot)
        return {"F": F, "ts": multi_vec}
    if variant == "multi_flat":
        # one (N*L, S) x (S, Hp) GEMM then one (N, L*Hp) x ... einsum via
        # reshaping the batched einsum as a single GEMM over candidates:
        # multi_vec[n,l,h] = sum_a mcv[n,l,a] onehot[n,a,h]
        #                  = [(L,Hp) x (Hp,H)] per n -> dot_general batch
        s_idx = jnp.clip(u - Hh * K, 0, S - 1)
        is_multi = u >= Hh * K
        su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
        mcv = jnp.dot(su.reshape(N * TOP_L, S), sa.states,
                      preferred_element_type=f32).reshape(N, TOP_L, Hp_)
        multi_vec = jax.lax.dot_general(
            mcv, onehot, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        return {"F": F, "ts": multi_vec}
    raise ValueError(variant)


def main_variants():
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sigma2 = jnp.float32(1.0)
    pi = 2.0 / H
    log_odds = jnp.asarray([np.log(pi) - np.log1p(-pi)], np.float32)
    space = binary_state_space(Hp, GAMMA)
    sa = LinearStateArrays(
        states=jnp.asarray(space.states), outer=jnp.asarray(space.outer),
        abs_states=jnp.asarray(space.abs_states),
        value_counts=jnp.asarray(space.value_counts),
        values=jnp.asarray(space.values))
    gram = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
    gram_diag = jnp.diagonal(gram)

    import time as _t
    def timeit(fn, sync, iters=8):
        out = fn(); sync(out)
        best = np.inf
        for _ in range(3):
            t0 = _t.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, (_t.perf_counter() - t0) / iters)
        return best * 1e3

    for variant in ("baseline", "single_only", "gather_only",
                    "multi_gather", "multi_onehot", "multi_flat"):
        f = jax.jit(lambda yy, vv=variant: chunked_decode(
            lambda yi: topstates_variants(
                yi, W, gram, gram_diag, sigma2, log_odds, sa, vv), yy, chunk))
        ms = timeit(lambda: f(y), lambda o: float(np.asarray(o["F"][0])))
        print(f"{variant:14s} {ms:8.2f} ms/{N}")




def topstates_variants2(y, W, gram, gram_diag, sigma2, log_odds, sa, variant,
                        Hp_=8):
    """Round 2 of the construction ablation: layout / dtype / compact."""
    f32 = jnp.float32
    N = y.shape[0]
    Hh = W.shape[1]
    K = sa.values.shape[0]
    S = sa.states.shape[0]
    P = jnp.dot(y, W, preferred_element_type=f32)
    w_norm = jnp.sqrt(jnp.maximum(gram_diag, 1e-30))
    cand, onehot = top_hprime_candidates_dense(P, w_norm, Hp_, False)
    q = jax.nn.softmax(jnp.pad(P, ((0, 0), (0, 1 + Hh*K + S - P.shape[1]))),
                       axis=1)
    top_q, top_u = top_l_argmax(q, TOP_L)
    u = top_u - 1
    v = sa.values
    is_single = (u >= 0) & (u < Hh * K)
    F = P[:, 0]
    sh = jnp.where(is_single, u // K, 0)
    sv = jnp.where(is_single, v[jnp.clip(u % K, 0, K - 1)], 0.0)
    s_idx = jnp.clip(u - Hh * K, 0, S - 1)
    is_multi = u >= Hh * K
    if variant == "compact":
        # candidate-space states + singleton (unit, value) — no (N,L,H)
        su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
        mcv = jnp.dot(su.reshape(N * TOP_L, S), sa.states,
                      preferred_element_type=f32).reshape(N, TOP_L, Hp_)
        return {"F": F, "cand": cand, "mcv": mcv, "sh": sh, "sv": sv}
    if variant == "single_flat":
        sv_f = sv.reshape(N * TOP_L)
        sh_f = sh.reshape(N * TOP_L)
        single_vec = jax.nn.one_hot(sh_f, Hh, dtype=f32) * sv_f[:, None]
        return {"F": F, "ts": single_vec.reshape(N, TOP_L * Hh)}
    if variant == "single_bf16":
        single_vec = (jax.nn.one_hot(sh, Hh, dtype=jnp.bfloat16)
                      * sv[..., None].astype(jnp.bfloat16))
        return {"F": F, "ts": single_vec}
    if variant == "full_flat":
        # everything in (N*L, H) layout; multi einsum via flat one-hot GEMMs:
        # ts = su_f @ states -> (N*L, Hp) coeffs, then scatter to H via the
        # PER-DATAPOINT onehot -- needs batch; instead expand coeffs to
        # (N, L*Hp) and do one dot_general batch over n with onehot (Hp,H).
        su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
        mcv = jnp.dot(su.reshape(N * TOP_L, S), sa.states,
                      preferred_element_type=f32).reshape(N, TOP_L, Hp_)
        multi_vec = jax.lax.dot_general(
            mcv, onehot, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        sv_f = sv.reshape(N * TOP_L)
        sh_f = sh.reshape(N * TOP_L)
        single_vec = jax.nn.one_hot(sh_f, Hh, dtype=f32) * sv_f[:, None]
        ts = multi_vec.reshape(N * TOP_L, Hh) + single_vec
        return {"F": F, "ts": ts.reshape(N, TOP_L * Hh)}
    if variant == "fused_where":
        # one fused broadcast-reduce: ts[nlh] = sum_a mcv*(iota==cand) + single
        su = jax.nn.one_hot(s_idx, S, dtype=f32) * is_multi[..., None]
        mcv = jnp.dot(su.reshape(N * TOP_L, S), sa.states,
                      preferred_element_type=f32).reshape(N, TOP_L, Hp_)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Hh), 3)
        hit = (iota == cand[:, None, :, None]).astype(f32)   # (N,1,Hp,H) bcast
        multi_vec = jnp.sum(mcv[..., None] * hit, axis=2)    # (N,L,H)
        single_vec = ((jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hh), 2)
                       == sh[..., None]).astype(f32) * sv[..., None])
        return {"F": F, "ts": multi_vec + single_vec}
    raise ValueError(variant)


def main_variants2():
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    sigma2 = jnp.float32(1.0)
    pi = 2.0 / H
    log_odds = jnp.asarray([np.log(pi) - np.log1p(-pi)], np.float32)
    space = binary_state_space(Hp, GAMMA)
    sa = LinearStateArrays(
        states=jnp.asarray(space.states), outer=jnp.asarray(space.outer),
        abs_states=jnp.asarray(space.abs_states),
        value_counts=jnp.asarray(space.value_counts),
        values=jnp.asarray(space.values))
    gram = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
    gram_diag = jnp.diagonal(gram)

    import time as _t
    def timeit(fn, sync, iters=8):
        out = fn(); sync(out)
        best = np.inf
        for _ in range(3):
            t0 = _t.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            best = min(best, (_t.perf_counter() - t0) / iters)
        return best * 1e3

    for variant in ("compact", "single_flat", "single_bf16", "full_flat",
                    "fused_where"):
        f = jax.jit(lambda yy, vv=variant: chunked_decode(
            lambda yi: topstates_variants2(
                yi, W, gram, gram_diag, sigma2, log_odds, sa, vv), yy, chunk))
        try:
            ms = timeit(lambda: f(y), lambda o: float(np.asarray(o["F"][0])))
            print(f"{variant:14s} {ms:8.2f} ms/{N}")
        except Exception as e:
            print(f"{variant:14s} FAILED {type(e).__name__}: {e}"[:200])

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "variants2":
        main_variants2()
    elif len(sys.argv) > 1 and sys.argv[1] == "variants":
        main_variants()
    else:
        main()
