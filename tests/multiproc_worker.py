"""Worker process for the real multi-process test (tests/test_multiprocess.py).

Reference behavior: SURVEY.md §5.8 — the reference runs under ``mpirun -n P``
with mpi4py; every rank loads its own data stride, allreduces sufficient
statistics, and only rank 0 writes output files.  This worker is the JAX
multi-controller analogue: ``jax.distributed.initialize`` against a local
coordinator, per-process ``stride_data`` shard loading, a cross-process
device mesh with gloo collectives, and rank-0-only DataLog/H5 output.

Launched by the test as:  python multiproc_worker.py RANK NPROCS PORT WORKDIR
(not collected by pytest — the filename does not start with ``test_``).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main(rank: int, nprocs: int, port: int, workdir: str) -> None:
    from prosper_tpu.parallel.mesh import init_multihost, stride_data

    if nprocs > 1:
        # MUST precede any backend touch (jax.devices(), jnp ops, ...)
        init_multihost(f"127.0.0.1:{port}", nprocs, rank)
    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
    assert jax.process_index() == rank

    import numpy as np

    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.engine.em import EM
    from prosper_tpu.io.datalog import DataLog, StoreToH5
    from prosper_tpu.models.linear import BSC
    from prosper_tpu.parallel.mesh import MeshRuntime

    wd = Path(workdir)
    y = np.load(wd / "y.npy")  # full dataset on disk; each rank slices
    first, last = stride_data(y.shape[0])
    y_local = np.ascontiguousarray(y[first:last])
    n_local = y_local.shape[0]

    p0 = np.load(wd / "params0.npz")
    params0 = {k: p0[k] for k in p0.files}
    D = y.shape[1]
    H = params0["W"].shape[1]

    model = BSC(D, H, Hprime=4, gamma=3)
    anneal = LinearAnnealing(12)
    anneal["T"] = [(0.0, 1.5), (0.6, 1.0)]
    anneal["anneal_prior"] = False

    rt = MeshRuntime()  # all devices across all processes, axis 'data'
    data = {
        "y": y_local.astype(np.float32),
        "valid": np.ones((n_local,), np.float32),
        "F_prev": np.zeros((n_local,), np.float32),
    }

    log = DataLog()
    log.set_handler(("F_mean", "n_used"), StoreToH5, str(wd / "result.h5"))

    em = EM(model, anneal, data, params=params0, runtime=rt, dlog=log, seed=5)
    em.run()
    log.close()

    if jax.process_index() == 0:
        np.savez(wd / f"final_p{nprocs}.npz",
                 **{k: np.asarray(jax.device_get(v))
                    for k, v in em.params.items()})
    # every rank reports its view of which files it (should have) written
    (wd / f"done_r{rank}.txt").write_text(
        f"proc={jax.process_index()}/{jax.process_count()} "
        f"devices={len(jax.devices())} local={len(jax.local_devices())}\n")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
