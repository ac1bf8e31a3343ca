"""Device-trace profile of the big-S E-step (round 4, VERDICT r3 #2).

Captures a jax.profiler trace of the full big-S `linear_et_estep` (XLA
scan and Pallas backends) at the bench config (TSC D=64 H=32 Hp=10
gamma=5, S=12,564, chunk=8192) and prints the top device ops by total
duration, so the A(recurrence)-vs-B(surroundings) split from
tools/ablate_bigs.py can be attributed to specific ops.

Run on the live chip:  python tools/profile_bigs.py [backend ...]
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

from prosper_tpu.core.etstep import linear_et_estep
from prosper_tpu.models.linear import TSC

C = 8192
S_BLOCK = 512
REPS = 20


def parse_trace(tracedir):
    """Sum device-track event durations by op name from the trace.json.gz."""
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find process ids whose name mentions TPU/device XLA op tracks
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        # skip the top-level module event (it spans everything)
        if name.startswith("jit_") or name.startswith("main"):
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_op[name] += d
        cnt_by_op[name] += 1
        total += d
    return dur_by_op, cnt_by_op, total


def main():
    backends = sys.argv[1:] or ["xla", "pallas"]
    rng = np.random.default_rng(0)
    model = TSC(64, 32, 10, 5, chunk=C, s_block=S_BLOCK)
    Hp = 10
    y = jnp.asarray(rng.standard_normal((C, model.D)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((model.D, model.H)).astype(np.float32))
    w = jnp.ones((C,), jnp.float32)
    lo = jnp.full((model.sa.values.shape[0],), -2.0, jnp.float32)

    for backend in backends:
        pb = backend == "pallas"

        @jax.jit
        def step(y, W, pb=pb):
            def body(carry, _):
                y_c = carry
                F, sums = linear_et_estep(
                    y_c, w, W, jnp.float32(1.0), lo, model.sa, Hp,
                    model.signed_select, jnp.float32(0.9), jnp.float32(0.9),
                    C, s_block=S_BLOCK, pallas_bigs=pb)
                bump = (jnp.sum(F) + jnp.sum(sums["xs"])) * 1e-30
                return y_c + bump, jnp.sum(F)
            yc, Fs = jax.lax.scan(body, y, None, length=REPS)
            return jnp.sum(Fs) + jnp.sum(yc) * 0.0

        out = step(y, W)
        jax.block_until_ready(out)
        tracedir = f"/tmp/bigs_trace_{backend}"
        os.makedirs(tracedir, exist_ok=True)
        with jax.profiler.trace(tracedir):
            out = step(y, W)
            jax.block_until_ready(out)
            float(np.asarray(out))
        t0 = time.perf_counter()
        out = step(y, W)
        jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / REPS
        print(f"\n=== backend={backend}: wall {wall*1e3:.2f} ms/chunk "
              f"({C/wall/1e6:.2f} M dp/s) ===")
        parsed = parse_trace(tracedir)
        if parsed is None:
            print("  (no trace file found)")
            continue
        dur, cnt, total = parsed
        print(f"  device total {total/REPS:.3f} ms/chunk over {REPS} reps; "
              f"top ops (ms/chunk):")
        for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:25]:
            print(f"    {d/REPS:8.4f} ms  x{cnt[name]//REPS:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
