"""TSC and DSC bars integration tests (BASELINE.json configs[1] family)."""

import numpy as np

from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models.linear import DSC, TSC


def _anneal(steps=80):
    a = LinearAnnealing(steps)
    a["T"] = [(0.0, 2.0), (0.7, 1.0)]
    a["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
    a["Ncut_factor"] = [(0.5, 0.0), (0.8, 1.0)]
    return a


def test_tsc_bars_recovery():
    """Ternary latents: bars appear with BOTH signs; learned columns match
    up to sign (|cosine| matching)."""
    R = 4
    D, H, Hp, gamma, N = R * R, 2 * R, 6, 3, 2000
    model = TSC(D, H, Hp, gamma)
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, N, seed=41)
    em = EM(model, _anneal(80), {"y": data["y"]}, seed=23)
    params = em.run()
    n_rec = count_recovered_bars(np.asarray(params["W"]),
                                 np.asarray(gt["W"]), threshold=0.8,
                                 signed=True)
    assert n_rec == H, f"recovered {n_rec}/{H} bars (TSC)"
    assert abs(float(params["sigma"]) - 1.0) < 0.35


def test_dsc_bars_recovery():
    """Discrete values Phi = {1, 2}: bars at two intensities."""
    R = 4
    D, H, Hp, gamma, N = R * R, 2 * R, 6, 3, 2000
    model = DSC(D, H, Hp, gamma, phi=(1.0, 2.0))
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, N, seed=43)
    em = EM(model, _anneal(80), {"y": data["y"]}, seed=29)
    params = em.run()
    n_rec = count_recovered_bars(np.asarray(params["W"]),
                                 np.asarray(gt["W"]), threshold=0.8,
                                 signed=True)
    assert n_rec == H, f"recovered {n_rec}/{H} bars (DSC)"
    # learned value probabilities stay a valid sub-simplex
    pi = np.asarray(params["pi"])
    assert (pi > 0).all() and pi.sum() < 1.0
