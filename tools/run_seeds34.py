"""Seeds 3-4 of the patches-scale benchmark, default protocol (rounds out
the 3-seed coact-split evidence to 5 seeds)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from examples.patches_scale_run import main

results = {}
for seed in (3, 4):
    t0 = time.time()
    rec, per_iter = main(seed=seed)
    results[seed] = rec
    print(f"[seeds34] seed={seed} recovered={rec}/300 "
          f"({time.time()-t0:.0f}s)", flush=True)
print("[seeds34] FINAL " + json.dumps(results), flush=True)
