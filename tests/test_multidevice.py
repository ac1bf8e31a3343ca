"""Multi-device equivalence: 1-device vs 8-device shard_map EM steps.

SURVEY.md §4 "Distributed testing": the reference's MPI P=1 vs P=4
bit-identical-trajectory property becomes: a shard_map'd step over an
8-device mesh must produce the same parameters as the single-device step
(up to float32 reduction-order noise), because suff stats are psum'd and the
M-step is computed identically on every device.
"""

import jax
import numpy as np
import pytest

from prosper_tpu.data.bars import bars_gt_params
from prosper_tpu.engine.anneal import LinearAnnealing
from prosper_tpu.engine.em import EM
from prosper_tpu.models.linear import BSC
from prosper_tpu.parallel.mesh import MeshRuntime, stride_data


@pytest.fixture(scope="module")
def problem():
    R = 4
    D, H, Hp, gamma, N = R * R, 2 * R, 5, 3, 512
    model = BSC(D, H, Hp, gamma, chunk=64)
    gt = bars_gt_params(model, intensity=10.0, sigma=1.0)
    data = model.generate_data(gt, N, seed=2)
    return model, gt, data


def test_eight_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


def test_single_vs_mesh_equivalence(problem):
    model, gt, data = problem
    anneal1 = LinearAnnealing(5)
    anneal8 = LinearAnnealing(5)

    em1 = EM(model, anneal1, {"y": data["y"]}, seed=9)
    p1 = em1.run()

    runtime = MeshRuntime()
    em8 = EM(model, anneal8, {"y": data["y"]}, seed=9, runtime=runtime)
    p8 = em8.run()

    np.testing.assert_allclose(np.asarray(p1["W"]), np.asarray(p8["W"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(p1["pi"]), float(p8["pi"]), rtol=1e-3)
    np.testing.assert_allclose(float(p1["sigma"]), float(p8["sigma"]),
                               rtol=1e-3)
    F1 = [h["F_mean"] for h in em1.history]
    F8 = [h["F_mean"] for h in em8.history]
    np.testing.assert_allclose(F1, F8, rtol=2e-3, atol=2e-3)


def test_mesh_params_replicated(problem):
    """After a sharded step, params must be fully replicated (SPMD
    determinism — the analogue of identical params on every MPI rank)."""
    model, gt, data = problem
    runtime = MeshRuntime()
    em = EM(model, LinearAnnealing(2), {"y": data["y"]}, seed=1,
            runtime=runtime)
    em.step_once()
    W = em.params["W"]
    assert W.sharding.is_fully_replicated


def test_stride_data():
    assert stride_data(10, parts=4, index=0) == (0, 3)
    assert stride_data(10, parts=4, index=1) == (3, 6)
    assert stride_data(10, parts=4, index=2) == (6, 8)
    assert stride_data(10, parts=4, index=3) == (8, 10)
    # covers all points exactly
    spans = [stride_data(10, 4, i) for i in range(4)]
    assert sum(b - a for a, b in spans) == 10


def test_run_scanned_matches_run(problem):
    """The jit-compiled lax.scan driver reproduces the Python-loop driver."""
    from prosper_tpu.engine.em import EM
    from prosper_tpu.engine.anneal import LinearAnnealing
    model, gt, data = problem

    def mk_anneal():
        a = LinearAnnealing(6)
        a["T"] = [(0.0, 2.0), (0.7, 1.0)]
        a["W_noise"] = [(0.0, 0.5), (0.7, 0.0)]
        return a

    em1 = EM(model, mk_anneal(), {"y": data["y"]}, seed=3)
    p1 = em1.run()
    em2 = EM(model, mk_anneal(), {"y": data["y"]}, seed=3)
    p2 = em2.run_scanned()
    np.testing.assert_allclose(np.asarray(p1["W"]), np.asarray(p2["W"]),
                               rtol=1e-4, atol=1e-4)
    q1 = [h["Q_mean"] for h in em1.history]
    q2 = [h["Q_mean"] for h in em2.history]
    np.testing.assert_allclose(q1, q2, rtol=1e-4, atol=1e-4)
    assert em2.anneal.finished


def test_replication_error_invariant(problem):
    """Params stay bit-identical across shards after a psum'd M-step
    (SURVEY §5.2 SPMD determinism, made assertable)."""
    import jax
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from prosper_tpu.parallel.mesh import MeshRuntime, replication_error

    model, gt, data = problem
    rt = MeshRuntime()

    def step_with_check(params, d, sched, rng, axis_name=None):
        p, F, scal = model.step_fn(params, d, sched, rng, axis_name=axis_name)
        scal = dict(scal, rep_err=replication_error(p, axis_name))
        return p, F, scal

    axis = rt.data_axis
    mapped = jax.shard_map(
        partial(step_with_check, axis_name=axis), mesh=rt.mesh,
        in_specs=(P(), P(axis), P(), P()), out_specs=(P(), P(axis), P()),
        check_vma=False)

    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    from prosper_tpu.engine.anneal import LinearAnnealing
    d = rt.shard_data(make_blank_data(data["y"]))
    params = rt.replicate(model.standard_init(data, seed=0))
    sched = sched_from_anneal(LinearAnnealing(5))
    p, F, scal = jax.jit(mapped)(params, d, sched, jax.random.PRNGKey(0))
    # ring all-reduce order differs per participant -> float-eps divergence
    assert float(scal["rep_err"]) < 1e-4


def test_revive_duplicates_replaces_weaker_column(problem):
    """Opt-in duplicate-unit revival: near-parallel columns get the weaker
    one re-initialised; distinct columns are untouched."""
    import jax.numpy as jnp
    from prosper_tpu.engine.em import EM
    from prosper_tpu.engine.anneal import LinearAnnealing

    model, gt, data = problem
    em = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=3,
            revive_duplicates=(1, 0.95))
    # random (mutually near-orthogonal) dictionary, then plant ONE duplicate
    # (standard_init's mean+noise columns are all near-parallel by design,
    # which would legitimately trigger revival everywhere)
    rng = np.random.default_rng(0)
    W = rng.standard_normal(
        np.asarray(em.params["W"]).shape).astype(np.float32) * 3.0
    W[:, 1] = 0.999 * W[:, 0]          # plant a near-duplicate (weaker)
    em.params = dict(em.params, W=jnp.asarray(W, jnp.float32))
    em.anneal.position = 1             # revival fires on multiples of every
    em._maybe_revive_duplicates()
    W2 = np.asarray(jax.device_get(em.params["W"]))
    c01 = (W2[:, 0] @ W2[:, 1]) / (np.linalg.norm(W2[:, 0])
                                   * np.linalg.norm(W2[:, 1]) + 1e-9)
    assert c01 < 0.95                  # duplicate broken
    np.testing.assert_allclose(W2[:, 0], W[:, 0])   # stronger kept
    np.testing.assert_allclose(W2[:, 2:], W[:, 2:]) # others untouched


def test_revive_dead_column(problem):
    """Opt-in dead-unit revival (4th tuple element): a column whose norm
    decayed far below the median gets re-initialised; healthy columns are
    untouched."""
    import jax.numpy as jnp
    from prosper_tpu.engine.em import EM
    from prosper_tpu.engine.anneal import LinearAnnealing

    model, gt, data = problem
    em = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=3,
            revive_duplicates=(1, 0.95, 0.75, 0.1))
    rng = np.random.default_rng(0)
    W = rng.standard_normal(
        np.asarray(em.params["W"]).shape).astype(np.float32) * 3.0
    W[:, 2] *= 1e-4                    # plant a dead (decayed) column
    em.params = dict(em.params, W=jnp.asarray(W, jnp.float32))
    em.anneal.position = 1
    em._maybe_revive_duplicates()
    W2 = np.asarray(jax.device_get(em.params["W"]))
    median = float(np.median(np.linalg.norm(W2, axis=0)))
    assert np.linalg.norm(W2[:, 2]) > 0.1 * median  # dead column revived
    np.testing.assert_allclose(W2[:, :2], W[:, :2]) # healthy untouched
    np.testing.assert_allclose(W2[:, 3:], W[:, 3:])


def test_split_revival_seeds_blend_pair(problem):
    """With split_norm_frac: a freed (dead) column is re-seeded as the
    symmetric +/- partner of the highest-norm column (suspected blend of
    two atoms) instead of a random direction."""
    import jax.numpy as jnp
    from prosper_tpu.engine.em import EM
    from prosper_tpu.engine.anneal import LinearAnnealing

    model, gt, data = problem
    em = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=3,
            revive_duplicates=(1, 0.95, 0.75, 0.1), split_norm_frac=1.3)
    rng = np.random.default_rng(0)
    W = rng.standard_normal(
        np.asarray(em.params["W"]).shape).astype(np.float32) * 3.0
    W[:, 0] *= 2.0                     # suspected blend (high norm)
    W[:, 2] *= 1e-4                    # dead column (gets freed)
    em.params = dict(em.params, W=jnp.asarray(W, jnp.float32))
    em.anneal.position = 1
    em._maybe_revive_duplicates()
    W2 = np.asarray(jax.device_get(em.params["W"]))
    # freed col 2 and blend col 0 are now a symmetric pair around old col 0
    np.testing.assert_allclose(W2[:, 0] + W2[:, 2], 2.0 * W[:, 0],
                               rtol=1e-5, atol=1e-4)
    assert np.linalg.norm(W2[:, 0] - W2[:, 2]) > 0   # actually perturbed
    np.testing.assert_allclose(W2[:, 1], W[:, 1])    # others untouched
    np.testing.assert_allclose(W2[:, 3:], W[:, 3:])


def test_reseed_worst_frac_samples_poorly_explained(problem):
    """With reseed_worst_frac: the revival sample comes from the datapoints
    with the lowest F_prev (worst explained), not uniformly."""
    import jax.numpy as jnp
    from prosper_tpu.engine.em import EM
    from prosper_tpu.engine.anneal import LinearAnnealing

    model, gt, data = problem
    em = EM(model, LinearAnnealing(10), {"y": data["y"]}, seed=3,
            revive_duplicates=(1, 0.95, 0.75, 0.1),
            reseed_worst_frac=1e-9)           # k=1: only THE worst row
    N = data["y"].shape[0]
    y = np.asarray(data["y"]).copy()
    y[7] = 0.0
    y[7, 0] = 100.0                           # distinctive direction
    F = np.zeros((N,), np.float32)
    F[7] = -1e9                               # worst-explained datapoint
    em.data = dict(em.data, y=jnp.asarray(y), F_prev=jnp.asarray(F))
    rng = np.random.default_rng(0)
    W = rng.standard_normal(
        np.asarray(em.params["W"]).shape).astype(np.float32) * 3.0
    W[:, 2] *= 1e-4                           # dead column gets re-seeded
    em.params = dict(em.params, W=jnp.asarray(W, jnp.float32))
    em.anneal.position = 1
    em._maybe_revive_duplicates()
    W2 = np.asarray(jax.device_get(em.params["W"]))
    col = W2[:, 2]
    cos = (col @ y[7]) / (np.linalg.norm(col) * np.linalg.norm(y[7]))
    assert cos > 0.9                          # seeded from the worst row
