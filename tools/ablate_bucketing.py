"""Candidate-signature bucketing ablation (VERDICT r2 #4).

The 2% useful-MFU question: ~80% of the executed E-step FLOPs are the
one-hot gather/scatter GEMMs (2·Hp·H² MACs/dp each for T-gather and
ss-scatter).  IF datapoints sharing a candidate SET were grouped, each
bucket's `W[:, cand]` / `gram[ix(cand,cand)]` slice becomes a real dense
GEMM operand and those MACs vanish.  This tool measures the three facts
that decide whether that formulation can win, on the patches config
(planted dictionary, the production workload):

  1. signature statistics — how much of the data do the biggest candidate-
     set buckets actually cover?  (bucketing is useless if signatures are
     unique; the signature is the SORTED candidate set)
  2. the perfect-bucket ceiling — throughput of the bucketed chunk E-step
     when the whole chunk shares one candidate set (selection pass + small-
     Gram ET algebra + necessary GEMMs, no one-hot gathers)
  3. the permutation tax — sorting datapoints into bucket order is a row
     gather of y; dynamic row gathers are the very thing the one-hot
     formulation avoids (ROUND2.md gather roofline)

Usage: python tools/ablate_bucketing.py [N] [chunk]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D, H, Hp, GAMMA = 256, 300, 8, 4


def signature_stats(y, W, n_report=(1, 16, 256, 4096)):
    """Bucket-size distribution of sorted candidate sets (host NumPy)."""
    P = y @ W
    wn = np.linalg.norm(W, axis=0) + 1e-30
    score = P / wn
    # iterated-argmax top-Hp (same tie-breaking as the TPU selection)
    cand = np.argsort(-score, axis=1, kind="stable")[:, :Hp]
    sig = np.sort(cand, axis=1)
    uniq, counts = np.unique(sig, axis=0, return_counts=True)
    counts = np.sort(counts)[::-1]
    N = y.shape[0]
    out = {"n_unique": int(uniq.shape[0]), "N": N,
           "largest": int(counts[0]),
           "mean_size": float(N / uniq.shape[0])}
    for k in n_report:
        out[f"cover_top{k}"] = float(counts[:k].sum() / N)
    # prefix-relaxation: bucket on the top-gamma slots only (the slots that
    # carry posterior mass), accept per-datapoint tails
    sig_g = np.sort(cand[:, :GAMMA], axis=1)
    uq, cg = np.unique(sig_g, axis=0, return_counts=True)
    cg = np.sort(cg)[::-1]
    out["gamma_prefix_unique"] = int(uq.shape[0])
    for k in n_report:
        out[f"gamma_prefix_cover_top{k}"] = float(cg[:k].sum() / N)
    return out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    import jax
    import jax.numpy as jnp

    from prosper_tpu.core.etstep import state_arrays_from
    from prosper_tpu.core.states import binary_state_space
    from prosper_tpu.models.linear import BSC

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    from patches_scale_run import planted_dictionary

    rng = np.random.default_rng(0)
    model = BSC(D, H, Hp, GAMMA, chunk=chunk)
    gt = {"W": planted_dictionary(D, H, seed=0),
          "pi": np.float32(2.0 / H), "sigma": np.float32(1.0)}
    data = model.generate_data(gt, N, seed=1)
    y_np = np.asarray(data["y"], np.float32)

    # --- 1. signature statistics (the decisive fact) -----------------------
    stats = signature_stats(y_np[:65536], gt["W"].astype(np.float32))
    print("[signatures, ground-truth W]")
    for k, v in stats.items():
        print(f"  {k:26s} {v}")
    W_r = rng.standard_normal((D, H)).astype(np.float32)  # cold-start W
    stats_r = signature_stats(y_np[:65536], W_r)
    print("[signatures, random init W]")
    for k in ("n_unique", "largest", "cover_top4096",
              "gamma_prefix_cover_top4096"):
        print(f"  {k:26s} {stats_r[k]}")

    # --- 2/3. on-chip timings ----------------------------------------------
    sa = state_arrays_from(binary_state_space(Hp, GAMMA))
    W = jnp.asarray(gt["W"], jnp.float32)
    y = jnp.asarray(y_np)
    sigma2 = jnp.float32(1.0)
    pi = 2.0 / H
    lo = jnp.float32(np.log(pi) - np.log1p(-pi))
    gram = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
    gram_diag = jnp.diagonal(gram)
    f32 = jnp.float32
    states = jnp.asarray(sa.states)          # (S, Hp) binary
    outer = jnp.asarray(sa.outer)            # (S, Hp*Hp)
    S = states.shape[0]

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

    # (a) production E-step reference
    from prosper_tpu.core.etstep import linear_et_estep
    prod = jax.jit(lambda yy: linear_et_estep(
        yy, jnp.ones((N,), f32), W, sigma2, lo[None], sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), chunk))
    ms = timeit(lambda: prod(y), lambda o: float(np.asarray(o[1]["F"])))
    print(f"\nproduction estep       {ms:8.2f} ms/{N} "
          f"({N/ms*1e3/1e6:.2f} M dp/s)")

    # (b) selection-only pass (what bucketing must ALSO run, pre-sort)
    def select_only(yy):
        def body(y_i):
            P = jnp.dot(y_i, W, preferred_element_type=f32)
            from prosper_tpu.core.select import top_hprime_candidates_dense
            wn = jnp.sqrt(jnp.maximum(gram_diag, 1e-30))
            cand, _ = top_hprime_candidates_dense(P, wn, Hp, False)
            return cand
        return jax.lax.map(body, yy.reshape(N // chunk, chunk, D))
    sel = jax.jit(select_only)
    ms_sel = timeit(lambda: sel(y), lambda o: int(np.asarray(o[0, 0, 0])))
    print(f"selection pass         {ms_sel:8.2f} ms/{N}")

    # (c) perfect-bucket E-step: the whole chunk shares ONE candidate set
    #     (static arange(Hp) slice stands in for any shared set — same cost)
    def bucket_estep(yy):
        Wc = W[:, :Hp]                                    # (D, Hp) shared
        Gc = gram[:Hp, :Hp]
        Gf = Gc.reshape(1, Hp * Hp)
        inv2s2 = 0.5 / sigma2

        def body(carry, y_i):
            P = jnp.dot(y_i, W, preferred_element_type=f32)     # singles
            proj = jnp.dot(y_i, Wc, preferred_element_type=f32)  # (C, Hp)
            lik_multi = (2.0 * jnp.dot(proj, states.T,
                                       preferred_element_type=f32)
                         - jnp.dot(Gf, outer.T,
                                   preferred_element_type=f32)) * inv2s2
            lik_single = (2.0 * P - gram_diag[None, :]) * inv2s2
            logits = jnp.concatenate(
                [jnp.zeros((y_i.shape[0], 1), f32), lik_single + lo,
                 lik_multi + jnp.sum(states, 1)[None, :] * lo], axis=1)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            Z = jnp.sum(p, axis=1, keepdims=True)
            q = p / Z
            q_single = q[:, 1:1 + H]
            q_multi = q[:, 1 + H:]
            s_cand = jnp.dot(q_multi, states, preferred_element_type=f32)
            # necessary GEMMs: full xs for singles + tiny bucket xs
            xs = jnp.dot(y_i.T, q_single, preferred_element_type=f32)
            xs_c = jnp.dot(y_i.T, s_cand, preferred_element_type=f32)
            ss_c = jnp.dot(jnp.sum(q_multi, axis=0, keepdims=True), outer,
                           preferred_element_type=f32)        # (1, Hp*Hp)
            F = (m + jnp.log(Z))[:, 0]
            acc = carry
            acc = (acc[0] + xs, acc[1] + xs_c, acc[2] + ss_c,
                   acc[3] + jnp.sum(F))
            return acc, F

        z = (jnp.zeros((D, H), f32), jnp.zeros((D, Hp), f32),
             jnp.zeros((1, Hp * Hp), f32), jnp.float32(0.0))
        acc, F = jax.lax.scan(body, z, yy.reshape(N // chunk, chunk, D))
        return acc, F
    bk = jax.jit(bucket_estep)
    ms_bk = timeit(lambda: bk(y), lambda o: float(np.asarray(o[0][3])))
    print(f"perfect-bucket estep   {ms_bk:8.2f} ms/{N} "
          f"({N/ms_bk*1e3/1e6:.2f} M dp/s)")

    # (d) the permutation tax: gather N rows of y in bucket order
    perm = jnp.asarray(rng.permutation(N), jnp.int32)
    g = jax.jit(lambda yy: jnp.take(yy, perm, axis=0))
    ms_perm = timeit(lambda: g(y), lambda o: float(np.asarray(o[0, 0])),
                     iters=4)
    print(f"row-permutation gather {ms_perm:8.2f} ms/{N} "
          f"({N * D * 4 / ms_perm * 1e3 / 1e9:.1f} GB/s)")

    tot = ms_sel + ms_bk + ms_perm
    print(f"\nbucketed pipeline ceiling (sel + perm + bucket estep): "
          f"{tot:.2f} ms = {N/tot*1e3/1e6:.2f} M dp/s "
          f"(excl. per-bucket boundary overheads)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
