"""On-chip streaming-EM benchmark (round 4, VERDICT r3 #7 'done' gate).

Measures the patches config (BSC D=256 H=300 Hp=8 gamma=4) three ways:

  1. HBM-resident EM.run_scanned at N=1e6   (the round-1 production path)
  2. StreamingEM at N=1e6, seg 256k         (same data volume, streamed)
  3. StreamingEM at N=4e6, seg 256k         (beyond the comfortable HBM
                                             working set: y alone is 4.1 GB
                                             + intermediates; the gate is
                                             <10% dp/s penalty vs #1)

Data is generated host-side once at 4e6 and sliced.  10 timed iterations
each after warmup (saturated schedule — the production steady state).

Run solo on the live chip:  python tools/bench_streaming.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.engine.stream import StreamingEM
from prosper_tpu.models import BSC

D, H, Hp, GAMMA = 256, 300, 8, 4
ITERS = 10
SEG = 262144


def planted(D, H, active_pixels=8, intensity=10.0, seed=0):
    rng = np.random.default_rng(seed)
    W = np.zeros((D, H), np.float32)
    for h in range(H):
        W[rng.choice(D, size=active_pixels, replace=False), h] = intensity
    return W


def main():
    N_big = 4_000_000
    rng = np.random.default_rng(1)
    gtW = planted(D, H)
    print("[gen] sampling 4e6 datapoints host-side...", flush=True)
    t0 = time.time()
    # generate in slabs to bound peak memory
    y = np.empty((N_big, D), np.float32)
    pi = 2.0 / H
    for lo in range(0, N_big, 500_000):
        hi = lo + 500_000
        s = (rng.random((hi - lo, H)) < pi)
        y[lo:hi] = (s @ gtW.T + rng.standard_normal((hi - lo, D))
                    ).astype(np.float32)
    print(f"[gen] done in {time.time()-t0:.0f}s "
          f"({y.nbytes/1e9:.1f} GB host)", flush=True)

    model = BSC(D, H, Hp, GAMMA, chunk=8192)
    params0 = model.standard_init({"y": y[:SEG]}, seed=3)

    def run_resident(N):
        anneal = LinearAnnealing(3 * ITERS)
        em = EM(model, anneal, {"y": y[:N]}, params=dict(params0), seed=7)
        em.run_scanned(ITERS)          # warmup at the SAME segment length
        best = 0.0                     # (a shorter warmup length would put
        for _ in range(2):             # the jit compile inside the timing)
            t0 = time.perf_counter()
            em.run_scanned(ITERS)
            best = max(best, N * ITERS / (time.perf_counter() - t0))
        return best

    def run_streamed(N, cache_bytes, iters=ITERS):
        anneal = LinearAnnealing(2 * iters + 2)
        sem = StreamingEM(model, anneal, y[:N], seg_size=SEG,
                          params=dict(params0), seed=7,
                          cache_bytes=cache_bytes)
        sem.step_once(); sem.step_once()        # warmup/compile (+ cache)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                sem.step_once()
            best = max(best, N * iters / (time.perf_counter() - t0))
        return best, sem.n_seg

    dps_res = run_resident(1_000_000)
    print(f"[resident] N=1e6: {dps_res/1e6:.2f} M dp/s", flush=True)

    dps_s1, nseg1 = run_streamed(1_000_000, 8 << 30)
    print(f"[streamed/cached] N=1e6 ({nseg1} segs): {dps_s1/1e6:.2f} M dp/s "
          f"({dps_s1/dps_res:.2%} of resident)", flush=True)

    dps_s4, nseg4 = run_streamed(N_big, 8 << 30)
    print(f"[streamed/cached] N=4e6 ({nseg4} segs): {dps_s4/1e6:.2f} M dp/s "
          f"({dps_s4/dps_res:.2%} of resident) "
          f"{'PASS' if dps_s4 >= 0.9 * dps_res else 'FAIL'} (<10% gate)",
          flush=True)

    # true beyond-HBM mode: cache disabled -> every iteration re-streams
    # the whole dataset through the host->device link.  In THIS environment
    # that link is the axon tunnel (~45 MB/s measured round 1) so the
    # number reports the tunnel, not the architecture; a real PCIe host
    # (~25 GB/s) uploads a 256 MB segment in ~10 ms, fully hidden behind
    # the ~23 ms compute of the previous segment.
    dps_u1, _ = run_streamed(1_000_000, 0, iters=2)
    print(f"[streamed/uncached] N=1e6: {dps_u1/1e6:.2f} M dp/s "
          f"({dps_u1/dps_res:.2%} of resident; tunnel-bound in this env)",
          flush=True)


if __name__ == "__main__":
    main()
