"""MCA on synthetic occlusion data — the model's motivating use-case.

Reference behavior: SURVEY.md §2 "MCA-ET" — maximal-causes superposition
``ybar_d = max_h W_dh s_h`` models images where opaque objects OCCLUDE each
other (the nearest/brightest cause wins a pixel) rather than adding.  This
example plants overlapping rectangular "objects" on a small canvas,
composes scenes by per-pixel max, and shows MCA recovering the objects
where a linear model (BSC) blends them at the overlaps.

Run (CPU is fine at this size):
    python examples/mca_occlusion.py
"""

import numpy as np

from prosper_tpu.data.bars import cosine_match
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models import BSC, MCA


def planted_objects(R=8, H=8, seed=0):
    """(D, H) dictionary of overlapping bright rectangles on an R x R canvas."""
    rng = np.random.default_rng(seed)
    W = np.zeros((R, R, H), np.float32)
    for h in range(H):
        # crowd the objects into the canvas center so they overlap heavily
        # (overlap is where max-composition differs from addition)
        r0, c0 = rng.integers(1, R - 4, size=2)
        hgt, wid = rng.integers(3, 5, size=2)
        W[r0:r0 + hgt, c0:c0 + wid, h] = rng.uniform(5.0, 12.0)
    return W.reshape(R * R, H)


def main(R=8, H=8, N=4096, iters=80, seed=0):
    D = R * R
    gtW = planted_objects(R, H, seed)
    gt = {"W": gtW, "pi": np.float32(2.5 / H), "sigma": np.float32(0.5)}

    # ONE occlusion dataset (composed by per-pixel max), fit by both
    # families: the linear model mis-explains overlap pixels (sum != max),
    # so its dictionary blends/attenuates the occluders
    gen = MCA(D, H, Hprime=5, gamma=3, chunk=512)
    data = gen.generate_data(gt, N, seed=seed + 1)

    def train(model, label):
        anneal = LinearAnnealing(iters)
        anneal["T"] = [(0.0, 1.5), (0.6, 1.0)]
        anneal["W_noise"] = [(0.0, 0.5), (0.6, 0.0)]
        em = EM(model, anneal, {"y": data["y"]}, seed=seed + 2,
                revive_duplicates=(10, 0.9, 0.75))
        params = em.run()
        _, cos = cosine_match(np.asarray(params["W"]), gtW)
        rec = int((cos > 0.85).sum())
        print(f"[{label}] recovered {rec}/{H} objects "
              f"(mean cosine {cos.mean():.3f})")
        return rec

    rec_mca = train(MCA(D, H, Hprime=5, gamma=3, chunk=512), "mca")
    rec_bsc = train(BSC(D, H, Hprime=5, gamma=3, chunk=512),
                    "bsc-on-occlusion")
    print(f"[occlusion] MCA {rec_mca}/{H} vs linear {rec_bsc}/{H}")
    return rec_mca, rec_bsc


if __name__ == "__main__":
    main()
