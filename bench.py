"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline metric (BASELINE.json): E-step datapoints/s/chip on the scaling
config "BSC on natural image patches": D=16x16=256, H=300, H'=8, gamma=4.
The reference publishes no perf numbers (BASELINE.md), so ``vs_baseline`` is
measured against a reference-equivalent vectorized NumPy/BLAS implementation
of the same truncated E-step on this host's CPU — the reference's compute
stack (SURVEY.md §0 "all heavy math goes through NumPy->BLAS").

Beyond the headline, ``families`` holds a reproducible per-model-family
matrix (VERDICT r1: only BSC regenerated from the harness; TSC/DSC/GSC/
MCA/MMCA numbers had no script), and the headline carries achieved
TFLOP/s + useful-FLOPs MFU (VERDICT r1 #10) so the driver's BENCH_r*.json
tracks efficiency as well as throughput.

Timing note: every timed group ends with a host fetch of a scalar derived
from the iteration chain — ``block_until_ready`` alone does not reliably
fence work through this environment's TPU relay (measured: impossible
dp/s without the fetch).

Run ``python bench.py`` for the full matrix, ``python bench.py bsc tsc``
for a subset.
"""

import json
import sys
import time

import numpy as np


# ---- configs ----------------------------------------------------------------
D, H, Hp, GAMMA = 256, 300, 8, 4        # headline: BSC patches config
N_TPU = 131072
CHUNK = 8192
N_CPU = 2048
#: protocol note (advisor round 4): GSC/max/mixture families moved from
#: iters=3 to ITERS=10 in round 4 alongside the per-slot optimization, so
#: wall dp/s deltas vs rounds <= 3 partially conflate the protocol change
#: with the code change; device traces isolate the code effect (GSC
#: 11.1 -> 7.6 ms/step ~ 1.46x).  Cross-round comparisons should use
#: BENCH_r04.json onward, which all measure at ITERS=10.
ITERS = 10

#: round-5 protocol finding (tools/profile_gsc_stages.py): one timed
#: dispatch through this environment's relay costs a FIXED ~31 ms round
#: trip regardless of how much device work it carries, so the per-dispatch
#: protocol above (10 steps/sync) deflates every wall number by ~3 ms/step
#: — e.g. GSC reads 12.7 M dp/s where the device executes 17.3 M.
#: ``dps_chained`` therefore measures CHAIN_ITERS steps inside ONE jitted
#: lax.scan (the production shape — engine.EM.run_scanned dispatches whole
#: segments the same way), amortising the round trip to < 1%.  Both
#: numbers are reported: ``dps`` keeps cross-round comparability
#: (BENCH_r04 and earlier are per-dispatch), ``dps_chained`` is the
#: production-rate headline from round 5 on.
CHAIN_ITERS = 50

#: v5e bf16 peak (the MXU rate every GEMM here runs at under default
#: precision: bf16 multiply / f32 accumulate)
PEAK_TFLOPS = 197.0


def numpy_baseline_dps(y, W, sigma, pi):
    """Reference-equivalent vectorized NumPy E-step (suff stats incl.)."""
    import itertools

    N = y.shape[0]
    states = []
    for k in range(2, GAMMA + 1):
        for sup in itertools.combinations(range(Hp), k):
            s = np.zeros(Hp)
            s[list(sup)] = 1.0
            states.append(s)
    SM = np.array(states)                     # (S, Hp)
    log_odds = np.log(pi) - np.log1p(-pi)
    inv2s2 = 0.5 / sigma ** 2

    t0 = time.perf_counter()
    P = y @ W                                  # (N, H)
    wn = np.linalg.norm(W, axis=0)
    cand = np.argpartition(-(P / wn), Hp, axis=1)[:, :Hp]       # (N, Hp)
    gram = W.T @ W
    proj = np.take_along_axis(P, cand, axis=1)                  # (N, Hp)
    G = gram[cand[:, :, None], cand[:, None, :]]                # (N, Hp, Hp)
    lik_multi = (2 * proj @ SM.T
                 - np.einsum("nab,sa,sb->ns", G, SM, SM)) * inv2s2
    gd = np.diag(gram)
    lik_single = (2 * P - gd[None, :]) * inv2s2                 # (N, H)
    logits = np.concatenate(
        [np.zeros((N, 1)),
         lik_single + log_odds,
         lik_multi + SM.sum(1)[None, :] * log_odds], axis=1)
    m = logits.max(1, keepdims=True)
    q = np.exp(logits - m)
    q /= q.sum(1, keepdims=True)
    q_single = q[:, 1:1 + H]
    q_multi = q[:, 1 + H:]
    s_cand = q_multi @ SM                                       # (N, Hp)
    s_full = q_single.copy()
    np.add.at(s_full, (np.arange(N)[:, None], cand), s_cand)
    xs = y.T @ s_full                                           # (D, H)
    ss_cand = np.einsum("ns,sa,sb->nab", q_multi, SM, SM)
    ss = np.zeros((H, H))
    np.add.at(ss, (cand[:, :, None], cand[:, None, :]), ss_cand)
    ss[np.arange(H), np.arange(H)] += q_single.sum(0)
    _ = (xs, ss)
    dt = time.perf_counter() - t0
    return N / dt


def _numpy_multi_states(Hp, gamma, values):
    """(S, Hp) valued multi-states (2 <= |support| <= gamma) + (S, K)
    per-value counts — the enumeration the reference-equivalent baselines
    share (SURVEY.md §2 'ET base': state matrix)."""
    import itertools
    K = len(values)
    states, counts = [], []
    for k in range(2, gamma + 1):
        for sup in itertools.combinations(range(Hp), k):
            for assign in itertools.product(range(K), repeat=k):
                s = np.zeros(Hp)
                c = np.zeros(K)
                for slot, vi in zip(sup, assign):
                    s[slot] = values[vi]
                    c[vi] += 1
                states.append(s)
                counts.append(c)
    return np.array(states), np.array(counts)


def numpy_linear_baseline_dps(y, W, sigma, pi_vec, values, Hp, gamma):
    """Reference-equivalent vectorized NumPy E-step for the LINEAR family
    (BSC/TSC/DSC by value set) incl. suff stats — the per-family CPU
    baseline (round 5, VERDICT r4 #7; generalises the BSC-only
    numpy_baseline_dps kept above for cross-round continuity)."""
    N, Dd = y.shape
    Hh = W.shape[1]
    K = len(values)
    vals = np.asarray(values, np.float64)
    SM, NK = _numpy_multi_states(Hp, gamma, values)
    pi_vec = np.asarray(pi_vec, np.float64)
    log_odds = np.log(pi_vec) - np.log(1.0 - pi_vec.sum())
    inv2s2 = 0.5 / sigma ** 2

    t0 = time.perf_counter()
    P = y @ W
    wn = np.linalg.norm(W, axis=0)
    score = P / wn
    if (vals < 0).any():
        score = np.abs(score)
    cand = np.argpartition(-score, Hp, axis=1)[:, :Hp]
    gram = W.T @ W
    proj = np.take_along_axis(P, cand, axis=1)
    G = gram[cand[:, :, None], cand[:, None, :]]                # (N,Hp,Hp)
    lik_multi = (2 * proj @ SM.T
                 - np.einsum("nab,sa,sb->ns", G, SM, SM)) * inv2s2
    gd = np.diag(gram)
    # singletons over all H x K values
    lik_single = (2 * P[:, :, None] * vals[None, None, :]
                  - gd[None, :, None] * (vals ** 2)[None, None, :]) * inv2s2
    logits = np.concatenate(
        [np.zeros((N, 1)),
         (lik_single + log_odds[None, None, :]).reshape(N, Hh * K),
         lik_multi + (NK @ log_odds)[None, :]], axis=1)
    m = logits.max(1, keepdims=True)
    q = np.exp(logits - m)
    q /= q.sum(1, keepdims=True)
    q_single = q[:, 1:1 + Hh * K].reshape(N, Hh, K)
    q_multi = q[:, 1 + Hh * K:]
    s_full = q_single @ vals
    s_cand = q_multi @ SM
    np.add.at(s_full, (np.arange(N)[:, None], cand), s_cand)
    xs = y.T @ s_full
    ss_cand = np.einsum("ns,sa,sb->nab", q_multi, SM, SM)
    ss = np.zeros((Hh, Hh))
    np.add.at(ss, (cand[:, :, None], cand[:, None, :]), ss_cand)
    ss[np.arange(Hh), np.arange(Hh)] += (q_single @ (vals ** 2)).sum(axis=0)
    _ = (xs, ss)
    dt = time.perf_counter() - t0
    return N / dt


def numpy_gsc_baseline_dps(y, W, sigma, pi, mu, psi, Hp, gamma):
    """Reference-equivalent vectorized NumPy GSC E-step: per-support
    integrated-slab Gaussian algebra (posterior covariance solve, logdet,
    quadratic form per enumerated support), batched over (N, S) with
    supports padded to gamma (SURVEY.md §2 'GSC')."""
    import itertools
    N, Dd = y.shape
    Hh = W.shape[1]
    supports = [sup for k in range(2, gamma + 1)
                for sup in itertools.combinations(range(Hp), k)]
    S = len(supports)
    inv2s2 = 0.5 / sigma ** 2

    t0 = time.perf_counter()
    P = y @ W
    wn = np.linalg.norm(W, axis=0)
    cand = np.argpartition(-(P / wn), Hp, axis=1)[:, :Hp]
    gram = W.T @ W
    G = gram[cand[:, :, None], cand[:, None, :]]                # (N,Hp,Hp)
    proj = np.take_along_axis(P, cand, axis=1)                  # (N,Hp)
    lo = np.log(pi) - np.log1p(-pi)
    logliks = np.empty((N, S))
    for si, sup in enumerate(supports):                         # vec over N
        k = len(sup)
        idx = list(sup)
        Gs = G[:, idx][:, :, idx]                               # (N,k,k)
        A = Gs / sigma ** 2 + np.eye(k) / psi                   # precision
        b = proj[:, idx] / sigma ** 2 + mu / psi                # (N,k)
        L = np.linalg.cholesky(A)
        z = np.linalg.solve(L, b[..., None])[..., 0]
        quad = 0.5 * (z ** 2).sum(axis=1)
        logdet = np.log(np.diagonal(L, axis1=1, axis2=2)).sum(axis=1)
        logliks[:, si] = (quad - logdet - 0.5 * k * np.log(psi)
                          - 0.5 * k * mu * mu / psi + k * lo)
    y2 = (y * y).sum(axis=1)
    logits = np.concatenate([np.zeros((N, 1)), logliks], axis=1)
    m = logits.max(1, keepdims=True)
    q = np.exp(logits - m)
    q /= q.sum(1, keepdims=True)
    _ = (q, y2)
    dt = time.perf_counter() - t0
    return N / dt


def numpy_max_baseline_dps(y, W, sigma, pi, Hp, gamma, signed=False):
    """Reference-equivalent vectorized NumPy MCA/MMCA E-step: the winner
    tile IS the work — ybar[n,s,d] = max over active causes (max-magnitude
    when signed) with no Gram shortcut (SURVEY.md §2 'MCA-ET')."""
    N, Dd = y.shape
    SM, _ = _numpy_multi_states(Hp, gamma, [1.0])
    S = SM.shape[0]
    inv2s2 = 0.5 / sigma ** 2
    lo = np.log(pi) - np.log1p(-pi)

    t0 = time.perf_counter()
    P = y @ W
    wn = np.linalg.norm(W, axis=0)
    score = np.abs(P / wn) if signed else P / wn
    cand = np.argpartition(-score, Hp, axis=1)[:, :Hp]
    Wc = W.T[cand]                                              # (N,Hp,D)
    act = (SM > 0)                                              # (S,Hp)
    # winner tile (N, S, D): masked max over active causes, built per
    # state (bounds the temporary at (N, Hp, D))
    big = -1e30
    ybar = np.empty((N, S, Dd))
    for si in range(S):
        msk = act[si]
        Wm = np.where(msk[None, :, None], Wc, big)              # (N,Hp,D)
        if signed:
            mag = np.where(msk[None, :, None], np.abs(Wc), big)
            wsel = np.argmax(mag, axis=1)                       # (N,D)
            ybar[:, si] = np.take_along_axis(
                Wm, wsel[:, None, :], axis=1)[:, 0]
        else:
            ybar[:, si] = Wm.max(axis=1)
    resid = y[:, None, :] - ybar
    lik = -(resid ** 2).sum(axis=2) * inv2s2
    logits = np.concatenate(
        [-(y ** 2).sum(1, keepdims=True) * inv2s2,
         lik + (act.sum(1) * lo)[None, :]], axis=1)
    m = logits.max(1, keepdims=True)
    q = np.exp(logits - m)
    q /= q.sum(1, keepdims=True)
    # responsibility-weighted accumulators (suff-stat stage)
    qs = q[:, 1:]
    s_cand = qs @ act.astype(np.float64)                        # (N,Hp)
    xs_c = np.einsum("ns,nd,nsd->n", qs, y, ybar)               # proxy accum
    _ = (s_cand, xs_c)
    dt = time.perf_counter() - t0
    return N / dt


def numpy_mix_baseline_dps(y, K, kind="mog"):
    """Vectorized NumPy mixture EM step (MoG/MoP): the (N,K) log-likelihood
    GEMM + responsibility-weighted moment GEMMs."""
    rng = np.random.default_rng(0)
    N, Dd = y.shape
    mu = rng.standard_normal((K, Dd))
    t0 = time.perf_counter()
    if kind == "mog":
        ll = (y @ mu.T - 0.5 * (mu * mu).sum(1)[None, :])
    else:
        lam = np.abs(mu) + 0.5
        ll = y @ np.log(lam).T - lam.sum(1)[None, :]
    m = ll.max(1, keepdims=True)
    r = np.exp(ll - m)
    r /= r.sum(1, keepdims=True)
    nk = r.sum(0)
    mu_new = (r.T @ y) / np.maximum(nk, 1e-9)[:, None]
    _ = mu_new
    dt = time.perf_counter() - t0
    return N / dt


def linear_flops_per_dp(Dd, Hh, Hhp, S, K=1):
    """(raw, useful) FLOPs/datapoint of the fused linear-family E-step.

    raw counts the executed MXU work including the one-hot gather/scatter
    GEMMs (2*Hp*H^2 MACs each for T-gather and ss-scatter — XLA flat
    gathers measured 100x below HBM speed on TPU, tools/probe_xla_flat.py,
    so one-hot GEMMs ARE the executed formulation); useful counts only the
    algorithmically necessary work an ideal sparse implementation needs.
    K>1 (TSC/DSC) multiplies the candidate-table width.
    """
    necessary = 2 * (2 * Dd * Hh) + 2 * (K * Hhp + (K * Hhp) ** 2) * S
    gather = 2 * 2 * (K * Hhp) * Hh * Hh
    return necessary + gather, necessary


def gsc_flops_per_dp(Dd, Hh, Hhp, S):
    """(raw, useful) FLOPs/datapoint of the GSC E-step (analytic estimate,
    round 4 / VERDICT r3 #4).  Dominant terms: the selection + xs GEMMs
    (2DH each) and the per-state padded slab systems — an (Hp x Hp)
    Cholesky (Hp^3/3 MACs) plus triangular solves / logdet / quadratic
    forms (~5 Hp^2) per enumerated support.  raw adds the one-hot Gram
    gather GEMMs (same formulation as the linear family)."""
    useful = 2 * (2 * Dd * Hh) + S * (Hhp ** 3 // 3 + 5 * Hhp * Hhp)
    gather = 2 * 2 * Hhp * Hh * Hh
    return useful + gather, useful


def max_flops_per_dp(Dd, Hh, Hhp, S):
    """(raw, useful) FLOPs/datapoint of the MCA/MMCA E-step (analytic
    estimate).  The max superposition admits no Gram shortcut, so the
    (S, D) winner tile IS the work: ~1 op/state/dim for the subset-lattice
    DP max, ~3 for the residual log-joint, ~3 for the responsibility /
    suff-stat accumulation — plus the selection and xs GEMMs.  raw adds
    the W-candidate gather and winner-scatter one-hot GEMMs."""
    useful = 2 * (2 * Dd * Hh) + 7 * S * Dd
    gather = 2 * 2 * Hhp * Hh * Dd
    return useful + gather, useful


def mix_flops_per_dp(Dd, K):
    """(raw, useful) FLOPs/datapoint of a mixture EM step: the (N,K)
    log-likelihood GEMM (2DK) plus the two (K,D) suff-stat GEMMs."""
    useful = 3 * (2 * Dd * K)
    return useful, useful


def _measure_step(model, params, N, iters, groups=3, data_tf=None):
    """Best-of-groups EM-step throughput with forced host sync."""
    import jax
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal

    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, model.D)).astype(np.float32)
    if data_tf is not None:
        y = data_tf(y)
    data = make_blank_data(y)
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)

    # the engine's per-iteration saturation rule (EM._sat_now): beta ==
    # prior_beta == 1 on the host schedule selects the specialized step
    # that skips the duplicate un-annealed F channel — LinearAnnealing's
    # default schedule is saturated, i.e. this measures the production
    # steady state (the anneal window is the short transient)
    saturated = (float(sched["beta"]) == 1.0
                 and float(sched["prior_beta"]) == 1.0)
    step = model.jit_step(saturated=saturated)
    p, F, s = step(params, data, sched, key)      # warmup/compile
    float(np.asarray(s["F_mean"]))
    data2 = dict(data, F_prev=F)
    best = 0.0
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, F, s = step(p, data2, sched, key)
        float(np.asarray(s["F_mean"]))            # force full sync
        best = max(best, N * iters / (time.perf_counter() - t0))
    return best


def _measure_step_chained(model, params, N, iters=CHAIN_ITERS, groups=2,
                          data_tf=None):
    """Production-shaped throughput: ``iters`` EM steps chained inside ONE
    jitted lax.scan (the shape engine.EM.run_scanned dispatches), so the
    relay's fixed ~31 ms/dispatch round trip amortises to <1%.  The scan
    body carries (params, F_prev) — a REAL iteration chain, nothing is
    loop-invariant (stage-loop pitfall, see tools/profile_gsc_stages.py)."""
    import jax
    import jax.numpy as jnp
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal

    rng = np.random.default_rng(1)
    y = rng.standard_normal((N, model.D)).astype(np.float32)
    if data_tf is not None:
        y = data_tf(y)
    data = make_blank_data(y)
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)
    saturated = (float(sched["beta"]) == 1.0
                 and float(sched["prior_beta"]) == 1.0)
    step = model.jit_step(saturated=saturated)

    # data rides as jit ARGUMENTS: closing over the (N, D) array would
    # embed it as an HLO literal and ship it with every remote-compile
    # request (measured: the MoG chain's 512 MB module bounced off the
    # compile helper with HTTP 413; the smaller families quietly paid
    # ~128 MB per compile upload)
    @jax.jit
    def chain(p, d):
        def body(carry, _):
            p_c, F_c = carry
            p2, F2, s = step(p_c, dict(d, F_prev=F_c), sched, key)
            return (p2, F2), s["F_mean"]
        (p2, _), fs = jax.lax.scan(body, (p, d["F_prev"]), None,
                                   length=iters)
        return fs[-1] + jnp.sum(fs) * 1e-30

    data = {k: jnp.asarray(v) for k, v in data.items()}
    out = chain(params, data)                         # warmup/compile
    float(np.asarray(out))
    best = 0.0
    for _ in range(groups):
        t0 = time.perf_counter()
        out = chain(params, data)
        float(np.asarray(out))                        # force full sync
        best = max(best, N * iters / (time.perf_counter() - t0))
    return best


def _family_entry(dps, flops=None, chained=None):
    e = {"dps": round(dps, 1)}
    if chained:
        e["dps_chained"] = round(chained, 1)
    rate = chained or dps       # efficiency from the production-shaped rate
    if flops is not None:
        raw, useful = flops
        e["tflops_raw"] = round(rate * raw / 1e12, 2)
        e["mfu_useful_pct"] = round(100 * rate * useful / 1e12 / PEAK_TFLOPS,
                                    2)
    return e


def _relay_alive() -> bool:
    """Fast liveness probe of this environment's axon loopback relay.

    When the relay daemon dies, ``jax.devices()`` hangs forever (no
    timeout in the dial path), which would hang the whole bench harness;
    the daemon's loopback port refuses instantly when it is down, so
    probe it and fail fast with an explicit JSON line instead.
    """
    import os
    import socket
    if not os.environ.get("AXON_LOOPBACK_RELAY"):
        return True            # not this environment's relay — no gating
    s = socket.socket()
    s.settimeout(2)
    try:
        s.connect(("127.0.0.1", 8082))
        return True
    except OSError:
        return False
    finally:
        s.close()


def main():
    if not _relay_alive():
        print(json.dumps({"error": "tpu_unreachable",
                          "detail": "axon relay daemon down (loopback "
                                    "port refused); see ROUND2.md "
                                    "environment note"}))
        return 1

    import jax
    import jax.numpy as jnp
    from prosper_tpu.models.gsc import GSC
    from prosper_tpu.models.linear import BSC, DSC, TSC
    from prosper_tpu.models.mca import MCA, MMCA

    only = set(a.lower() for a in sys.argv[1:])

    def want(name):
        return not only or name in only

    rng = np.random.default_rng(0)
    W0 = rng.standard_normal((D, H)).astype(np.float32)
    pi0, sigma0 = 2.0 / H, 1.0

    results, results_chained, families = {}, {}, {}

    # ---- headline: BSC patches config, both backends ------------------------
    S_bsc = None
    if want("bsc"):
        for backend in ("pallas", "xla"):
            try:
                model = BSC(D, H, Hp, GAMMA, chunk=CHUNK, backend=backend)
                S_bsc = model.sa.states.shape[0]
                params = {"W": jnp.asarray(W0), "pi": jnp.float32(pi0),
                          "sigma": jnp.float32(sigma0)}
                results[backend] = _measure_step(model, params, N_TPU, ITERS)
                results_chained[backend] = _measure_step_chained(
                    model, params, N_TPU)
            except Exception as e:                  # noqa: BLE001
                print(f"[bench] bsc/{backend} failed: {e!r}", file=sys.stderr)
        if results:
            families["bsc"] = _family_entry(
                max(results.values()), linear_flops_per_dp(D, H, Hp, S_bsc),
                chained=(max(results_chained.values())
                         if results_chained else None))
            families["bsc"]["backends"] = {k: round(v, 1)
                                           for k, v in results.items()}
            if results_chained:
                families["bsc"]["backends_chained"] = {
                    k: round(v, 1) for k, v in results_chained.items()}
        if len(results) == 2:
            # on-chip numerics regression (VERDICT r2 weak #5): one EM step
            # per backend on identical inputs; every updated parameter and
            # the summed free energy must agree to <= 1e-4 relative
            try:
                from prosper_tpu.engine.anneal import LinearAnnealing
                from prosper_tpu.models.base import (make_blank_data,
                                                     sched_from_anneal)
                rng_eq = np.random.default_rng(8)
                y_eq = rng_eq.standard_normal((CHUNK, D)).astype(np.float32)
                data_eq = make_blank_data(y_eq)
                sched_eq = sched_from_anneal(LinearAnnealing(10))
                key_eq = jax.random.PRNGKey(1)
                outs = {}
                for backend in ("pallas", "xla"):
                    m = BSC(D, H, Hp, GAMMA, chunk=CHUNK, backend=backend)
                    params = {"W": jnp.asarray(W0), "pi": jnp.float32(pi0),
                              "sigma": jnp.float32(sigma0)}
                    p, F, s = m.jit_step()(params, data_eq, sched_eq, key_eq)
                    outs[backend] = {**{k: np.asarray(v)
                                        for k, v in p.items()},
                                     "F_sum": np.asarray(s["F_total"])}
                max_rel = 0.0
                for k in outs["pallas"]:
                    a, b = outs["pallas"][k], outs["xla"][k]
                    rel = float(np.max(np.abs(a - b))
                                / (np.max(np.abs(b)) + 1e-30))
                    max_rel = max(max_rel, rel)
                families["bsc"]["backends_match"] = bool(max_rel <= 1e-4)
                families["bsc"]["backends_max_rel"] = float(f"{max_rel:.3g}")
            except Exception as e:                  # noqa: BLE001
                print(f"[bench] backends_match failed: {e!r}",
                      file=sys.stderr)
                families["bsc"]["backends_match"] = False

    # per-family measured CPU baselines (round 5, VERDICT r4 #7): every
    # family's vs_baseline is ITS OWN reference-equivalent NumPy E-step
    # measurement, not an extrapolation from the BSC number
    def attach_baseline(name, fn):
        if name not in families:
            return
        try:
            cpu = fn()
            families[name]["baseline"] = {"numpy_cpu_dps": round(cpu, 1)}
            rate = families[name].get("dps_chained", families[name]["dps"])
            families[name]["vs_baseline"] = round(rate / cpu, 1)
        except Exception as e:                      # noqa: BLE001
            print(f"[bench] baseline/{name} failed: {e!r}", file=sys.stderr)

    def _cpu_y(n, d, seed=11):
        return np.random.default_rng(seed).standard_normal((n, d))

    # ---- family matrix (BASELINE.md row configs) ----------------------------
    def run_family(name, factory, N, iters=5, flops=None, backend_note=None,
                   with_chained=True):
        if not want(name):
            return
        try:
            model = factory()
            params = model.standard_init(
                {"y": np.random.default_rng(2).standard_normal(
                    (256, model.D)).astype(np.float32)}, seed=4)
            dps = _measure_step(model, params, N, iters, groups=2)
            chained = None
            if with_chained:
                try:
                    chained = _measure_step_chained(model, params, N)
                except Exception as e:              # noqa: BLE001
                    print(f"[bench] {name} chained failed: {e!r}",
                          file=sys.stderr)
            fl = flops(model) if flops else None
            families[name] = _family_entry(dps, fl, chained=chained)
            if backend_note:
                families[name]["backend"] = backend_note
        except Exception as e:                      # noqa: BLE001
            print(f"[bench] {name} failed: {e!r}", file=sys.stderr)

    run_family(
        "tsc", lambda: TSC(D, H, 6, 3, chunk=CHUNK, backend="pallas"),
        N_TPU, flops=lambda m: linear_flops_per_dp(
            D, H, 6, m.sa.states.shape[0], K=2), backend_note="pallas")
    attach_baseline("tsc", lambda: numpy_linear_baseline_dps(
        _cpu_y(N_CPU, D), W0.astype(np.float64), sigma0,
        [pi0 / 2, pi0 / 2], [-1.0, 1.0], 6, 3))
    run_family(
        "dsc", lambda: DSC(D, H, 5, 3, phi=(-1.0, 1.0, 2.0), chunk=CHUNK,
                           backend="pallas"),
        N_TPU, flops=lambda m: linear_flops_per_dp(
            D, H, 5, m.sa.states.shape[0], K=3), backend_note="pallas")
    attach_baseline("dsc", lambda: numpy_linear_baseline_dps(
        _cpu_y(N_CPU, D), W0.astype(np.float64), sigma0,
        [pi0 / 3] * 3, [-1.0, 1.0, 2.0], 5, 3))
    # big-S on-chip path (SURVEY §5.7 motivation: S explodes combinatorially;
    # single-chip here, state-sharded on a mesh).  s_block = the online-
    # logsumexp state-tiled path — the (chunk, S) logits never reach HBM;
    # backend='pallas' fuses the whole recurrence in VMEM (ops/bigs_pallas)
    if want("tsc_bigs"):
        # N=524288 (64 chunks per step call): the round-4 device trace
        # (tools/profile_bigs.py) measured the big-S step at ~0.73 ms
        # device per 8192-chunk (11 M dp/s) while the wall number at
        # N=65536 was dominated by this environment's per-dispatch relay
        # cost — the production regime (1e6 datapoints/iteration) chains
        # 122+ chunks per dispatch, which this batch size approximates.
        bks, bks_ch = {}, {}
        for backend in ("pallas", "xla"):
            try:
                # round 5: the merged-GEMM scan shifted the XLA optimum to
                # s_block=1024 (swept on chip: 512 -> 12.7 M, 1024 -> 13.4,
                # 2048 -> 13.1); the fused kernel's fully-folded form
                # (bias/mask/mass in the GEMMs) prefers the 1024 lane tile
                # but still trails the scan by ~6% (BASELINE.md round 5)
                model = TSC(64, 32, 10, 5, chunk=8192,
                            s_block=1024 if backend == "xla" else 512,
                            backend=backend)
                params = model.standard_init(
                    {"y": np.random.default_rng(2).standard_normal(
                        (256, model.D)).astype(np.float32)}, seed=4)
                bks[backend] = _measure_step(model, params, 524288, 2,
                                             groups=2)
                bks_ch[backend] = _measure_step_chained(
                    model, params, 524288, iters=12)
            except Exception as e:                  # noqa: BLE001
                print(f"[bench] tsc_bigs/{backend} failed: {e!r}",
                      file=sys.stderr)
        if bks:
            families["tsc_bigs"] = _family_entry(
                max(bks.values()),
                chained=(max(bks_ch.values()) if bks_ch else None))
            families["tsc_bigs"]["backends"] = {k: round(v, 1)
                                                for k, v in bks.items()}
        attach_baseline("tsc_bigs", lambda: numpy_linear_baseline_dps(
            _cpu_y(256, 64),
            np.random.default_rng(2).standard_normal((64, 32)), sigma0,
            [0.05, 0.05], [-1.0, 1.0], 10, 5))
    # batch sizes amortise the relay/dispatch fixed cost (~3 ms/call —
    # measured: MCA "2.4M" at N=16k vs 6.2M at N=262k, same program).
    # Round 4 (VERDICT r3 #4): GSC runs the PATCHES-SCALE config like the
    # linear families (apples-to-apples matrix) with MFU fields; the old
    # D=64 H=100 config stays as gsc_small for cross-round continuity.
    run_family("gsc", lambda: GSC(D, H, 6, 3, chunk=CHUNK), N_TPU,
               iters=ITERS, flops=lambda m: gsc_flops_per_dp(
                   D, H, 6, m.sa.states.shape[0]))
    attach_baseline("gsc", lambda: numpy_gsc_baseline_dps(
        _cpu_y(N_CPU, D), W0.astype(np.float64), sigma0, pi0,
        mu=1.0, psi=0.25, Hp=6, gamma=3))
    run_family("gsc_small", lambda: GSC(64, 100, 6, 3, chunk=8192), 262144,
               iters=ITERS, flops=lambda m: gsc_flops_per_dp(
                   64, 100, 6, m.sa.states.shape[0]),
               with_chained=False)
    attach_baseline("gsc_small", lambda: numpy_gsc_baseline_dps(
        _cpu_y(N_CPU, 64),
        np.random.default_rng(2).standard_normal((64, 100)), sigma0, pi0,
        mu=1.0, psi=0.25, Hp=6, gamma=3))
    # max family at the same patches-scale config (round 4): fused VMEM
    # winner-lattice kernel (ops/max_pallas.py) vs the XLA tile path
    for name, cls in (("mca", MCA), ("mmca", MMCA)):
        if not want(name):
            continue
        bks, bks_ch = {}, {}
        model = None
        for backend in ("pallas", "xla"):
            try:
                model = cls(D, H, 6, 3, chunk=4096, backend=backend)
                params = model.standard_init(
                    {"y": np.random.default_rng(2).standard_normal(
                        (256, model.D)).astype(np.float32)}, seed=4)
                bks[backend] = _measure_step(model, params, 131072, ITERS,
                                             groups=2)
                bks_ch[backend] = _measure_step_chained(model, params,
                                                        131072)
            except Exception as e:                  # noqa: BLE001
                print(f"[bench] {name}/{backend} failed: {e!r}",
                      file=sys.stderr)
        if bks:
            families[name] = _family_entry(
                max(bks.values()),
                max_flops_per_dp(D, H, 6, model.sa.states.shape[0]),
                chained=(max(bks_ch.values()) if bks_ch else None))
            families[name]["backends"] = {k: round(v, 1)
                                          for k, v in bks.items()}
        attach_baseline(name, lambda name=name: numpy_max_baseline_dps(
            _cpu_y(1024, D), W0.astype(np.float64), sigma0, pi0, 6, 3,
            signed=(name == "mmca")))
    # old D=64 H=100 max-family config (cross-round continuity; the fused
    # winner-lattice kernel fits VMEM here — at the patches config the
    # (S, D)-per-lane lattice exceeds it and the XLA path serves)
    for name, cls in (("mca_small", MCA), ("mmca_small", MMCA)):
        run_family(
            name, lambda cls=cls: cls(64, 100, 6, 3, chunk=8192,
                                      backend="pallas"),
            262144, iters=ITERS,
            flops=lambda m: max_flops_per_dp(64, 100, 6,
                                             m.sa.states.shape[0]),
            backend_note="pallas", with_chained=False)
        attach_baseline(name, lambda name=name: numpy_max_baseline_dps(
            _cpu_y(1024, 64),
            np.random.default_rng(2).standard_normal((64, 100)), sigma0,
            pi0, 6, 3, signed=name.startswith("mmca")))

    # mixtures at clustering scale matching the patches dims (round 4:
    # D=256, K=300 — same data dim / component count as the ET matrix)
    for mix_name in ("mog", "mop"):
        if not want(mix_name):
            continue
        try:
            from prosper_tpu.models.mixtures import MoG, MoP
            model = (MoG(D=D, K=H, chunk=65536) if mix_name == "mog"
                     else MoP(D=D, K=H, chunk=65536))
            y0 = np.random.default_rng(5).standard_normal(
                (1024, D)).astype(np.float32)
            if mix_name == "mop":
                y0 = np.abs(np.floor(y0 * 3)).astype(np.float32)  # counts
            params = model.standard_init({"y": y0}, seed=6)
            tf = ((lambda y: np.abs(np.floor(y * 3)).astype(np.float32))
                  if mix_name == "mop" else None)
            try:
                mix_ch = _measure_step_chained(model, params, 524288,
                                               data_tf=tf)
            except Exception as e:                  # noqa: BLE001
                print(f"[bench] {mix_name} chained failed: {e!r}",
                      file=sys.stderr)
                mix_ch = None
            families[mix_name] = _family_entry(
                _measure_step(model, params, 524288, ITERS, groups=2,
                              data_tf=tf), mix_flops_per_dp(D, H),
                chained=mix_ch)
            attach_baseline(mix_name, lambda: numpy_mix_baseline_dps(
                _cpu_y(16384, D), H, kind=mix_name))
        except Exception as e:                      # noqa: BLE001
            print(f"[bench] {mix_name} failed: {e!r}", file=sys.stderr)

    # ---- serving decode (model.inference, device-resident input) ------------
    # round 5 (VERDICT r4 #3): measured per backend — 'pallas' runs the
    # fused q-stage decode kernel (ops/linear_pallas.py::_decode_kernel),
    # 'xla' the chunked formulation (the round-3/4 production path)
    if want("decode"):
        try:
            params = {"W": jnp.asarray(W0), "pi": jnp.float32(pi0),
                      "sigma": jnp.float32(sigma0)}
            y_dev = jnp.asarray(np.random.default_rng(3).standard_normal(
                (N_TPU, D)).astype(np.float32))
            # timed like _measure_step: several back-to-back calls per group
            # so the relay's fixed per-dispatch cost (~3 ms + sync latency,
            # ~20 ms on a lone call) amortises as it does in real serving
            reps = 5
            for label, dense in (("decode", True), ("decode_compact", False)):
                bks = {}
                for backend in ("pallas", "xla"):
                    try:
                        model = BSC(D, H, Hp, GAMMA, chunk=CHUNK,
                                    backend=backend)
                        out = model.inference(params, {"y": y_dev},
                                              top_L=10, dense_states=dense)
                        float(np.asarray(out["F"][0]))
                        best = 0.0
                        for _ in range(3):
                            t0 = time.perf_counter()
                            for _ in range(reps):
                                out = model.inference(
                                    params, {"y": y_dev}, top_L=10,
                                    dense_states=dense)
                            float(np.asarray(out["F"][0]))
                            best = max(best, reps * N_TPU
                                       / (time.perf_counter() - t0))
                        bks[backend] = best
                    except Exception as e:          # noqa: BLE001
                        print(f"[bench] {label}/{backend} failed: {e!r}",
                              file=sys.stderr)
                if bks:
                    families[label] = {"dps": round(max(bks.values()), 1),
                                       "top_L": 10,
                                       "backends": {k: round(v, 1)
                                                    for k, v in bks.items()}}
        except Exception as e:                      # noqa: BLE001
            print(f"[bench] decode failed: {e!r}", file=sys.stderr)

    # ---- CPU reference baseline --------------------------------------------
    out = {}
    if want("bsc") and results:
        y_cpu = np.random.default_rng(0).standard_normal(
            (N_CPU, D)).astype(np.float64)
        cpu_dps = numpy_baseline_dps(y_cpu, W0.astype(np.float64),
                                     sigma0, pi0)
        # headline value = the production-shaped (chained-scan) rate from
        # round 5 on; the per-dispatch rate rides along for cross-round
        # comparability with BENCH_r01-r04 (see the CHAIN_ITERS note above)
        tpu_disp = max(results.values())
        tpu_dps = max(results_chained.values()) if results_chained \
            else tpu_disp
        if "bsc" in families:
            families["bsc"]["baseline"] = {"numpy_cpu_dps": round(cpu_dps, 1)}
            families["bsc"]["vs_baseline"] = round(tpu_dps / cpu_dps, 1)
        raw, useful = linear_flops_per_dp(D, H, Hp, S_bsc)
        out = {
            "metric": ("BSC-ET E-step throughput "
                       "(patches config D=256 H=300 Hp=8 gamma=4)"),
            "value": round(tpu_dps, 1),
            "unit": "datapoints/s/chip",
            "protocol": f"chained_scan_{CHAIN_ITERS}" if results_chained
                        else "per_dispatch_10",
            "value_per_dispatch": round(tpu_disp, 1),
            "vs_baseline": round(tpu_dps / cpu_dps, 2),
            "baseline": {"numpy_cpu_dps": round(cpu_dps, 1)},
            "tflops_raw": round(tpu_dps * raw / 1e12, 2),
            "mfu_useful_pct": round(
                100 * tpu_dps * useful / 1e12 / PEAK_TFLOPS, 2),
            "peak_tflops_bf16": PEAK_TFLOPS,
        }
    out["families"] = families
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
