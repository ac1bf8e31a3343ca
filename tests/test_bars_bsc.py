"""BSC-ET bars integration test — THE reference correctness benchmark.

SURVEY.md §4: "the bars test is the integration test: generate data from
ground-truth params with fixed seed, run a short EM schedule, assert
(a) free energy increases, (b) most/all bars recovered via cosine matching."
Config mirrors BASELINE.json configs[0] at CPU-test scale.
"""

import numpy as np
import pytest

from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models.linear import BSC


def _bars_anneal(steps=60):
    anneal = LinearAnnealing(steps)
    anneal["T"] = [(0.0, 2.0), (0.7, 1.0)]
    anneal["Ncut_factor"] = [(0.0, 0.0), (0.5, 0.0), (0.9, 1.0)]
    anneal["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
    anneal["anneal_prior"] = False
    return anneal


def test_bsc_bars_recovery():
    R = 5
    D, H, Hp, gamma, N = R * R, 2 * R, 6, 3, 1000
    model = BSC(D, H, Hp, gamma)
    gt = bars_gt_params(model, intensity=10.0, sigma=2.0)
    data = model.generate_data(gt, N, seed=11)

    em = EM(model, _bars_anneal(60), {"y": data["y"]}, seed=5)
    params = em.run()

    W = np.asarray(params["W"])
    n_rec = count_recovered_bars(W, np.asarray(gt["W"]), threshold=0.85)
    assert n_rec == H, f"recovered only {n_rec}/{H} bars"

    # un-annealed free energy improves over training
    Q = [h["Q_mean"] for h in em.history]
    assert Q[-1] > Q[5]
    # monotone over the last stretch (fixed T=1, no noise)
    tail = Q[-8:]
    assert all(b >= a - 1e-3 for a, b in zip(tail, tail[1:]))

    # learned noise/sparsity close to ground truth
    assert abs(float(params["sigma"]) - 2.0) < 0.3
    assert abs(float(params["pi"]) - 0.2) < 0.08


def test_bsc_bars_overcomplete():
    """BASELINE.json configs[0] literally: H=16 learned units on 5x5 bars
    (10 ground-truth bars), H'=6, gamma=3, N=1000."""
    R = 5
    D, H, Hp, gamma, N = R * R, 16, 6, 3, 1000
    model = BSC(D, H, Hp, gamma)
    gt = bars_gt_params(model, intensity=10.0, sigma=2.0, pi=2.0 / 10)
    # only the first 10 columns are bars; zero columns never activate, so
    # adjust pi of the generator to the true bars only
    gt["pi"] = np.float32(2.0 / 16)
    data = model.generate_data(gt, N, seed=3)

    em = EM(model, _bars_anneal(60), {"y": data["y"]}, seed=7)
    params = em.run()
    W = np.asarray(params["W"])
    n_rec = count_recovered_bars(W, np.asarray(gt["W"])[:, :10], threshold=0.85)
    assert n_rec >= 9, f"recovered only {n_rec}/10 bars (overcomplete)"
