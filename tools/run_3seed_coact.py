"""3-seed patches-scale run with support-size coact blend splitting.

Measures VERDICT weak #6 / next-round #6: does co-activation-guided
splitting with the corrected (support-size) detector beat the 292/300
plateau?  Protocol identical to the round-1 best (120 iters + gamma=5
refinement, revival 0.85 + worst-F reseeding) plus split_coact.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from examples.patches_scale_run import main

results = {}
for seed in (0, 1, 2):
    t0 = time.time()
    rec, per_iter = main(seed=seed, split_norm_frac=1.5, split_coact=True,
                         refine_gamma=5)
    results[seed] = rec
    print(f"[3seed] seed={seed} recovered={rec}/300 "
          f"({time.time()-t0:.0f}s)", flush=True)
print("[3seed] FINAL " + json.dumps(results), flush=True)
