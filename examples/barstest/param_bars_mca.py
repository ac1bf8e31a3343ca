"""Bars test for MCA-ET (max superposition / occlusion) — BASELINE configs[2].

Run:  python -m prosper_tpu.cli train examples/barstest/param_bars_mca.py
"""

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.models import MCA
from prosper_tpu.data.bars import bars_gt_params

R = 4
model = MCA(D=R * R, H=2 * R, Hprime=6, gamma=3, chunk=1000)

gt_params = bars_gt_params(model, intensity=10.0, sigma=1.0)
N = 1000
seed = 21

anneal = LinearAnnealing(80)
anneal["T"] = [(0.0, 2.0), (0.7, 1.0)]
anneal["W_noise"] = [(0.0, 1.0), (0.7, 0.0)]
anneal["Ncut_factor"] = [(0.5, 0.0), (0.8, 1.0)]
