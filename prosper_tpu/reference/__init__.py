"""Reference-equivalent NumPy implementations (the parity/benchmark oracle).

The upstream ProSper library is pure NumPy/BLAS + mpi4py (SURVEY.md §0).
This subpackage hosts a faithful single-process NumPy float64 EM for the
linear ET family, used for:

  * the CPU-vs-TPU trajectory comparison harness (BASELINE.md: free-energy
    trajectories must match "within Monte-Carlo/seed error"),
  * the bench.py speed baseline (same algorithm on the host CPU),
  * debugging numerical drift (float64 ground truth).

It is intentionally written in the reference's style (materialised
candidate gathers, explicit reconstructions) — NOT the TPU formulation —
so it is an independent check, not a transcription of the production path.
"""

from prosper_tpu.reference.numpy_em import NumpyBSC, numpy_em_run

__all__ = ["NumpyBSC", "numpy_em_run"]
