"""Mixture models: EM recovery of planted components (MoG, MoP)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models.mixtures import MoG, MoP


def _match(est, true):
    """Hungarian match components; returns mean abs error of matched rows."""
    C = np.linalg.norm(est[:, None, :] - true[None, :, :], axis=2)
    r, c = linear_sum_assignment(C)
    return est[r][np.argsort(c)], C[r, c].mean()


def test_mog_recovers_components():
    D, K, N = 8, 3, 4000
    rng = np.random.default_rng(0)
    mu_true = rng.standard_normal((K, D)) * 4.0
    gt = {"pi": np.array([0.5, 0.3, 0.2], np.float32),
          "mu": mu_true.astype(np.float32),
          "sigma": np.array([0.5, 0.7, 0.6], np.float32)}
    model = MoG(D, K)
    data = model.generate_data(gt, N, seed=1)

    em = EM(model, LinearAnnealing(40), {"y": data["y"]}, seed=3)
    params = em.run()
    mu_est = np.asarray(params["mu"])
    _, err = _match(mu_est, mu_true)
    assert err < 0.2, f"component mean error {err:.3f}"
    Q = [h["Q_mean"] for h in em.history]
    assert all(b >= a - 1e-3 for a, b in zip(Q[-10:], Q[-9:]))


def test_mog_assignment_accuracy():
    D, K, N = 5, 3, 2000
    rng = np.random.default_rng(5)
    gt = {"pi": np.full(K, 1 / K, np.float32),
          "mu": (rng.standard_normal((K, D)) * 5).astype(np.float32),
          "sigma": np.full(K, 0.4, np.float32)}
    model = MoG(D, K)
    data = model.generate_data(gt, N, seed=6)
    out = model.inference(gt, data)
    acc = (np.asarray(out["assign"]) == data["s"]).mean()
    assert acc > 0.97


def test_mop_recovers_rates():
    D, K, N = 6, 2, 4000
    gt = {"pi": np.array([0.6, 0.4], np.float32),
          "lam": np.array([[1, 2, 3, 4, 5, 6],
                           [9, 8, 7, 6, 5, 4]], np.float32)}
    model = MoP(D, K)
    data = model.generate_data(gt, N, seed=2)
    em = EM(model, LinearAnnealing(30), {"y": data["y"]}, seed=4)
    params = em.run()
    lam_est = np.asarray(params["lam"])
    _, err = _match(lam_est, np.asarray(gt["lam"], np.float64))
    assert err < 0.6, f"rate error {err:.3f}"
    pi_est = np.sort(np.asarray(params["pi"]))
    np.testing.assert_allclose(pi_est, [0.4, 0.6], atol=0.05)


def test_mixture_on_mesh():
    from prosper_tpu.parallel.mesh import MeshRuntime
    D, K, N = 4, 2, 512
    rng = np.random.default_rng(7)
    gt = {"pi": np.array([0.5, 0.5], np.float32),
          "mu": (rng.standard_normal((K, D)) * 4).astype(np.float32),
          "sigma": np.full(K, 0.5, np.float32)}
    model = MoG(D, K)
    data = model.generate_data(gt, N, seed=8)
    em1 = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=9)
    p1 = em1.run()
    em8 = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=9,
             runtime=MeshRuntime())
    p8 = em8.run()
    np.testing.assert_allclose(np.asarray(p1["mu"]), np.asarray(p8["mu"]),
                               rtol=2e-3, atol=2e-3)
