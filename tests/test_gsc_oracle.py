"""GSC E-step vs float64 brute-force oracle + spike-and-slab recovery test."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp

from prosper_tpu.core.etstep import state_arrays_from
from prosper_tpu.core.gscstep import gsc_et_estep
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.models.gsc import GSC


def gsc_oracle(y, W, sigma, pi, mu, psi, Hp, gamma, candidates,
               beta=1.0, prior_beta=1.0):
    """Explicit per-support Gaussian algebra, float64."""
    y = np.asarray(y, np.float64)
    W = np.asarray(W, np.float64)
    N, D = y.shape
    H = W.shape[1]
    sigma2 = sigma ** 2
    lo = np.log(pi) - np.log(1 - pi)

    sums = dict(xs=np.zeros((D, H)), ss=np.zeros((H, H)), s=np.zeros(H),
                abs=0.0, y2=0.0, n=0.0, F=0.0)
    F_out = np.zeros(N)
    for n in range(N):
        cand = candidates[n]
        supports = [()]
        supports += [(h,) for h in range(H)]
        for k in range(2, gamma + 1):
            for sup in itertools.combinations(range(Hp), k):
                supports.append(tuple(int(cand[i]) for i in sup))
        logits, stats = [], []
        for sup in supports:
            k = len(sup)
            if k == 0:
                lik = 0.0
                kap, Sig = None, None
            else:
                Ws = W[:, list(sup)]
                M = np.eye(k) / psi + Ws.T @ Ws / sigma2
                b = Ws.T @ y[n] / sigma2 + mu / psi
                Minv = np.linalg.inv(M)
                kap = Minv @ b
                Sig = Minv
                lik = (-0.5 * k * np.log(psi)
                       - 0.5 * np.linalg.slogdet(M)[1]
                       - k * mu * mu / (2 * psi)
                       + 0.5 * b @ kap)
            logits.append(beta * lik + prior_beta * k * lo)
            stats.append((sup, kap, Sig))
        logits = np.array(logits)
        Fn = (logsumexp(logits)
              - beta * 0.5 * (y[n] @ y[n]) / sigma2
              - beta * 0.5 * D * np.log(2 * np.pi * sigma2)
              + prior_beta * H * np.log(1 - pi))
        F_out[n] = Fn
        q = np.exp(logits - logsumexp(logits))
        sz = np.zeros(H)
        szsz = np.zeros((H, H))
        for qi, (sup, kap, Sig) in zip(q, stats):
            if not sup:
                continue
            idx = list(sup)
            sz[idx] += qi * kap
            szsz[np.ix_(idx, idx)] += qi * (Sig + np.outer(kap, kap))
            sums["abs"] += qi * len(sup)
        sums["xs"] += np.outer(y[n], sz)
        sums["ss"] += szsz
        sums["s"] += sz
        sums["y2"] += y[n] @ y[n]
        sums["n"] += 1
        sums["F"] += Fn
    return F_out, sums


@pytest.mark.parametrize("mu,psi,beta", [(0.0, 1.0, 1.0), (0.7, 2.5, 1.0),
                                         (0.3, 0.8, 0.4)])
def test_gsc_estep_matches_oracle(mu, psi, beta):
    N, D, H, Hp, gamma = 10, 8, 5, 5, 3       # Hp=H: tie-insensitive
    rng = np.random.default_rng(8)
    W = rng.standard_normal((D, H)).astype(np.float32)
    y = (rng.standard_normal((N, D)) * 1.5).astype(np.float32)
    sigma, pi = 1.1, 0.25

    space = binary_state_space(Hp, gamma)
    sa = state_arrays_from(space)
    F, sums = jax.jit(
        lambda y_: gsc_et_estep(y_, jnp.ones((N,), jnp.float32),
                                jnp.asarray(W), jnp.float32(sigma ** 2),
                                jnp.float32(pi), jnp.float32(mu),
                                jnp.float32(psi), sa, Hp,
                                jnp.float32(beta), jnp.float32(1.0),
                                chunk=2048)
    )(jnp.asarray(y))

    cand = np.tile(np.arange(H), (N, 1))
    F_o, sums_o = gsc_oracle(y, W, sigma, pi, mu, psi, Hp, gamma, cand,
                             beta=beta)
    np.testing.assert_allclose(np.asarray(F), F_o, rtol=5e-4, atol=5e-4)
    for key in ("xs", "ss", "s", "abs", "y2", "n", "F"):
        np.testing.assert_allclose(np.asarray(sums[key]), sums_o[key],
                                   rtol=5e-3, atol=5e-3, err_msg=key)


def test_gsc_bars_recovery():
    """Spike-and-slab bars: continuous slab amplitudes on bar dictionaries."""
    from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.engine.em import EM

    R = 4
    D, H, Hp, gamma, N = R * R, 2 * R, 5, 3, 1500
    model = GSC(D, H, Hp, gamma, chunk=1500)
    gt = bars_gt_params(model, intensity=5.0, sigma=1.0)
    gt["mu"] = np.float32(1.0)
    gt["psi"] = np.float32(0.09)     # slab ~ N(1, 0.3^2): bars with jitter
    data = model.generate_data(gt, N, seed=31)

    anneal = LinearAnnealing(70)
    anneal["T"] = [(0.0, 2.0), (0.7, 1.0)]
    anneal["W_noise"] = [(0.0, 0.5), (0.7, 0.0)]
    em = EM(model, anneal, {"y": data["y"]}, seed=17)
    params = em.run()
    n_rec = count_recovered_bars(np.asarray(params["W"]),
                                 np.asarray(gt["W"]), threshold=0.8,
                                 signed=True)
    assert n_rec == H, f"recovered {n_rec}/{H} bars (GSC)"
    # W*mu should carry the bar scale; sigma near gt
    assert abs(float(params["sigma"]) - 1.0) < 0.4


def test_gsc_batch_last_matches_tensor_formulation():
    """The entry-wise batch-last Cholesky path must reproduce the
    (C,S,Hp,Hp)-tensor formulation exactly (same recurrences, same
    clamping), for F and every sufficient statistic."""
    import jax.numpy as jnp

    from prosper_tpu.core import states as states_mod
    from prosper_tpu.core.etstep import state_arrays_from
    from prosper_tpu.core.gscstep import gsc_et_estep

    rng = np.random.default_rng(5)
    N, D, H, Hp, gamma = 96, 12, 10, 5, 3
    sa = state_arrays_from(states_mod.binary_state_space(Hp, gamma))
    y = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    w = jnp.asarray((rng.random(N) > 0.1).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)

    F1, s1 = gsc_et_estep(y, w, W, 0.8, 0.12, 0.3, 1.4, sa, Hp,
                          1.0, 1.0, chunk=48, batch_last=False)
    F2, s2 = gsc_et_estep(y, w, W, 0.8, 0.12, 0.3, 1.4, sa, Hp,
                          1.0, 1.0, chunk=48, batch_last=True)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=1e-5, atol=1e-5)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)
