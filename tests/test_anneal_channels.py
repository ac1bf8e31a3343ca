"""Behavioral tests for the annealing-driven data selection and noise
channels (reference: select_partial_data / noisify_params semantics)."""

import jax
import numpy as np
import pytest

from prosper_tpu.data.bars import bars_gt_params
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.models.base import make_blank_data, sched_from_anneal
from prosper_tpu.models.linear import BSC


@pytest.fixture(scope="module")
def setup():
    model = BSC(16, 8, 5, 3)
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, 400, seed=3)
    params = model.standard_init(data, seed=1)
    return model, gt, data, params


def test_partial_fraction_controls_n_used(setup):
    model, gt, data, params = setup
    d = make_blank_data(data["y"])
    a = LinearAnnealing(5)
    a["partial"] = 0.25
    sched = sched_from_anneal(a)
    _, _, scal = model.jit_step()(params, d, sched, jax.random.PRNGKey(0))
    assert float(scal["n_used"]) == pytest.approx(100, abs=1)


def test_ncut_keeps_best_explained(setup):
    model, gt, data, params = setup
    d = make_blank_data(data["y"])
    # first pass to get F; second pass with full Ncut
    a = LinearAnnealing(5)
    sched = sched_from_anneal(a)
    step = model.jit_step()
    p, F, _ = step(params, d, sched, jax.random.PRNGKey(0))
    a2 = LinearAnnealing(5)
    a2["Ncut_factor"] = 1.0
    sched2 = sched_from_anneal(a2)
    d2 = dict(d, F_prev=F)
    _, _, scal = step(p, d2, sched2, jax.random.PRNGKey(1))
    n_used = float(scal["n_used"])
    # keep fraction = A_gamma(pi) < 1; must have cut something but kept most
    assert 100 < n_used < 400


def test_param_noise_channels(setup):
    model, gt, data, params = setup
    import jax.numpy as jnp
    a = LinearAnnealing(5)
    a["W_noise"] = 2.0
    a["pi_noise"] = 5.0       # huge -> must stay clipped to (0,1)
    a["sigma_noise"] = 0.5
    sched = sched_from_anneal(a)
    noisy = model.noisify(params, sched, jax.random.PRNGKey(7))
    dW = float(jnp.std(noisy["W"] - params["W"]))
    assert 1.5 < dW < 2.5                     # ~N(0, 2) jitter applied
    assert 0.0 < float(noisy["pi"]) < 1.0
    assert float(noisy["sigma"]) > 0.0


def test_anneal_prior_changes_posterior(setup):
    """anneal_prior=True scales the prior term by beta as well."""
    model, gt, data, params = setup
    d = make_blank_data(data["y"])
    step = model.jit_step()
    a1 = LinearAnnealing(5); a1["T"] = 4.0; a1["anneal_prior"] = False
    a2 = LinearAnnealing(5); a2["T"] = 4.0; a2["anneal_prior"] = True
    _, F1, _ = step(params, d, sched_from_anneal(a1), jax.random.PRNGKey(0))
    _, F2, _ = step(params, d, sched_from_anneal(a2), jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(F1), np.asarray(F2))
