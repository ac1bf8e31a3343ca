"""Multi-restart best-F selection (engine/em.py::run_restarts)."""

import numpy as np
import pytest

from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM, run_restarts
from prosper_tpu.models.linear import BSC


def test_run_restarts_selects_best_final_f():
    R = 4
    D, H = R * R, 2 * R
    model = BSC(D, H, 5, 3)
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, 600, seed=7)

    ems = []

    def build(i):
        anneal = LinearAnnealing(20)
        anneal["T"] = [(0.0, 2.0), (0.7, 1.0)]
        anneal["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
        em = EM(model, anneal, {"y": data["y"]}, seed=100 + i,
                params=model.standard_init(data, seed=200 + i))
        ems.append(em)
        return em

    params, summary = run_restarts(build, 3)
    assert len(summary["F_means"]) == 3
    best = summary["best"]
    assert summary["F_means"][best] == max(summary["F_means"])
    # the returned params are the best restart's params
    np.testing.assert_array_equal(np.asarray(params["W"]),
                                  np.asarray(ems[best].params["W"]))
    # and they solve the problem
    assert count_recovered_bars(np.asarray(params["W"]),
                                np.asarray(gt["W"]), 0.8) == H


def test_run_restarts_validates_n():
    with pytest.raises(ValueError):
        run_restarts(lambda i: None, 0)
