"""Device-trace profile of the D-tiled max kernel + GSC at patches config.

Round 4: the dtiled kernel measures 5.4 M dp/s at (Ct=128, Dt=64); the
VPU-compute roofline estimate is ~17 M.  GSC at the patches config runs
6.4 M vs BSC's 12 M.  This tool captures jax.profiler traces of both and
prints the top device ops so the next optimisation is data-driven.

Run solo on the live chip:  python tools/profile_dtiled.py [mca|gsc ...]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C = 8192
REPS = 10


def parse_trace(tracedir, reps):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_name.get(e.get("pid"), ""):
            continue
        name = e.get("name", "?")
        dur[name] += e.get("dur", 0) / 1e3
        cnt[name] += 1
    print("  top device ops (ms/chunk):")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:14]:
        print(f"    {d/reps:8.4f} ms  x{cnt[name]//reps:5d}  {name[:90]}")


def profile(tag, step_fn, *args):
    @jax.jit
    def chained(a, b):
        def body(carry, _):
            a_c, acc = carry
            out = step_fn(a_c, b)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return (a_c + bump, acc + bump), None
        (_, acc), _ = jax.lax.scan(body, (a, jnp.float32(0.0)), None,
                                   length=REPS)
        return acc

    out = chained(*args)
    jax.block_until_ready(out)
    tracedir = f"/tmp/trace_{tag}"
    os.makedirs(tracedir, exist_ok=True)
    with jax.profiler.trace(tracedir):
        out = chained(*args)
        jax.block_until_ready(out)
        float(np.asarray(out))
    t0 = time.perf_counter()
    out = chained(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    wall = (time.perf_counter() - t0) / REPS
    print(f"\n=== {tag}: wall {wall*1e3:.2f} ms/chunk "
          f"({C/wall/1e6:.2f} M dp/s) ===")
    parse_trace(tracedir, REPS)


def main():
    which = sys.argv[1:] or ["mca", "gsc"]
    rng = np.random.default_rng(0)

    if "mca" in which:
        from prosper_tpu.core.etstep import state_arrays_from
        from prosper_tpu.core.states import binary_state_space
        from prosper_tpu.ops.max_pallas import max_et_estep_pallas_dtiled
        D, H, Hp = 256, 300, 6
        sa = state_arrays_from(binary_state_space(Hp, 3))
        W = jnp.asarray(np.abs(rng.standard_normal((D, H))).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
        w = jnp.ones((C,), jnp.float32)
        lo = jnp.float32(np.log(0.02 / 0.98))

        def step(y, W):
            return max_et_estep_pallas_dtiled(
                y, w, W, jnp.float32(1.0), lo, sa, Hp, False,
                jnp.float32(1.0), jnp.float32(1.0))
        profile("mca_dtiled", step, y, W)

    if "gsc" in which:
        from prosper_tpu.core.etstep import state_arrays_from
        from prosper_tpu.core.states import binary_state_space
        from prosper_tpu.core.gscstep import gsc_et_estep
        D, H, Hp = 256, 300, 6
        sa = state_arrays_from(binary_state_space(Hp, 3))
        W = jnp.asarray(rng.standard_normal((D, H)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
        w = jnp.ones((C,), jnp.float32)

        def step(y, W):
            return gsc_et_estep(
                y, w, W, jnp.float32(1.0), jnp.float32(0.02),
                jnp.float32(1.0), jnp.float32(0.5), sa, Hp,
                jnp.float32(1.0), jnp.float32(1.0), C)
        profile("gsc_estep", step, y, W)


if __name__ == "__main__":
    main()
