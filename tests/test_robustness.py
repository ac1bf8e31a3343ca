"""Multi-seed robustness: bars recovery across seeds (the reference's
statistical success criterion — recovery rates, not single runs)."""

import numpy as np
import pytest

from prosper_tpu.data.bars import bars_gt_params, count_recovered_bars
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models.linear import BSC


@pytest.mark.parametrize("nothing", [None])
def test_bsc_bars_multiseed(nothing):
    R = 4
    D, H, Hp, gamma, N = R * R, 2 * R, 5, 3, 1000
    full = 0
    seeds = range(6)
    for seed in seeds:
        model = BSC(D, H, Hp, gamma)
        gt = bars_gt_params(model, intensity=10.0, sigma=1.5)
        data = model.generate_data(gt, N, seed=100 + seed)
        a = LinearAnnealing(80)
        a["T"] = [(0.0, 2.0), (0.7, 1.0)]
        a["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
        a["Ncut_factor"] = [(0.5, 0.0), (0.9, 1.0)]
        em = EM(model, a, {"y": data["y"]}, seed=seed)
        p = em.run()
        rec = count_recovered_bars(np.asarray(p["W"]), np.asarray(gt["W"]),
                                   threshold=0.85)
        full += int(rec == H)
    assert full >= 5, f"all-bars recovery in only {full}/6 seeds"
