"""Fused max-family Pallas kernel vs the XLA path (interpret mode on CPU).

Same contract as tests/test_pallas.py for the linear family: the kernel
must reproduce core/maxstep.py::max_et_estep's per-datapoint F and every
summed sufficient statistic at f32 tolerance, including non-divisible N
(weight-0 padding) and zero-weight rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosper_tpu.core.etstep import state_arrays_from
from prosper_tpu.core.maxstep import max_et_estep
from prosper_tpu.core.states import binary_state_space
from prosper_tpu.ops.max_pallas import max_et_estep_pallas


def _setup(D, H, Hp, gamma, N, seed, magnitude):
    rng = np.random.default_rng(seed)
    space = binary_state_space(Hp, gamma)
    sa = state_arrays_from(space)
    W = rng.standard_normal((D, H)).astype(np.float32)
    if not magnitude:
        W = np.abs(W)      # MCA is a non-negative-dictionary model
    y = rng.standard_normal((N, D)).astype(np.float32) * 2.0
    return sa, jnp.asarray(W), jnp.asarray(y)


@pytest.mark.parametrize("magnitude", [False, True])
@pytest.mark.parametrize("beta,prior_beta", [(1.0, 1.0), (0.5, 1.0),
                                             (0.7, 0.7)])
def test_max_pallas_matches_xla(magnitude, beta, prior_beta):
    D, H, Hp, gamma, N = 16, 24, 5, 3, 160
    sa, W, y = _setup(D, H, Hp, gamma, N, 3, magnitude)
    weight = jnp.asarray(
        np.random.default_rng(4).random(N) < 0.8, jnp.float32)
    lo = jnp.float32(np.log(0.15 / 0.85))
    s2 = jnp.float32(1.3)
    b, pb = jnp.float32(beta), jnp.float32(prior_beta)

    F1, s1 = jax.jit(lambda: max_et_estep(
        y, weight, W, s2, lo, sa, Hp, magnitude, b, pb, chunk=N))()
    F2, s2_ = jax.jit(lambda: max_et_estep_pallas(
        y, weight, W, s2, lo, sa, Hp, magnitude, b, pb, tile=32,
        interpret=True))()

    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=1e-4)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2_[k]),
                                   rtol=3e-5, atol=2e-4, err_msg=k)


def test_max_pallas_pads_non_divisible_N():
    """N=100 with tile=32 -> 28 weight-0 padding rows; sums unchanged."""
    D, H, Hp, gamma, N = 8, 16, 4, 3, 100
    sa, W, y = _setup(D, H, Hp, gamma, N, 7, False)
    weight = jnp.ones((N,), jnp.float32)
    lo = jnp.float32(np.log(0.2 / 0.8))
    F1, s1 = jax.jit(lambda: max_et_estep(
        y, weight, W, jnp.float32(1.0), lo, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), chunk=N))()
    F2, s2 = jax.jit(lambda: max_et_estep_pallas(
        y, weight, W, jnp.float32(1.0), lo, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), tile=32, interpret=True))()
    assert F2.shape == (N,)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=1e-4)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=3e-5, atol=2e-4, err_msg=k)


@pytest.mark.parametrize("cls_name", ["MCA", "MMCA"])
def test_mca_backend_pallas_step_matches_xla(cls_name):
    """Full jit_step dispatch: backend='pallas' (interpret) must reproduce
    the XLA model's updated params and scalars, and the rho > 0 softened-
    max window must route through the lax.cond XLA branch bit-exactly."""
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models import mca as mca_mod
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal

    cls = getattr(mca_mod, cls_name)
    D, H, Hp, gamma, N = 16, 24, 4, 3, 96
    rng = np.random.default_rng(11)
    W0 = rng.standard_normal((D, H)).astype(np.float32)
    if cls_name == "MCA":
        W0 = np.abs(W0)
    y = rng.standard_normal((N, D)).astype(np.float32)
    params = {"W": jnp.asarray(W0), "pi": jnp.float32(0.1),
              "sigma": jnp.float32(1.0)}
    data = make_blank_data(y)
    key = jax.random.PRNGKey(0)

    m_x = cls(D, H, Hp, gamma, chunk=N)
    m_p = cls(D, H, Hp, gamma, chunk=N, backend="pallas")
    m_p._pallas_interpret = True

    for rho in (0.0, 4.0):
        sched = dict(sched_from_anneal(LinearAnnealing(10)),
                     rho=jnp.float32(rho))
        p_x, F_x, s_x = m_x.jit_step()(params, data, sched, key)
        p_p, F_p, s_p = m_p.jit_step()(params, data, sched, key)
        np.testing.assert_allclose(np.asarray(F_x), np.asarray(F_p),
                                   rtol=2e-5, atol=1e-4)
        for k in p_x:
            np.testing.assert_allclose(
                np.asarray(p_x[k]), np.asarray(p_p[k]), rtol=1e-4,
                atol=1e-5, err_msg=f"param {k} (rho={rho})")
        np.testing.assert_allclose(
            np.asarray(s_x["F_mean"]), np.asarray(s_p["F_mean"]), rtol=1e-5)


def test_max_pallas_zero_weight_chunk():
    """An all-zero-weight tile must contribute nothing (and not NaN)."""
    D, H, Hp, gamma, N = 8, 16, 4, 2, 64
    sa, W, y = _setup(D, H, Hp, gamma, N, 9, True)
    weight = jnp.concatenate([jnp.ones((32,)), jnp.zeros((32,))]).astype(
        jnp.float32)
    lo = jnp.float32(np.log(0.2 / 0.8))
    F1, s1 = jax.jit(lambda: max_et_estep(
        y, weight, W, jnp.float32(0.8), lo, sa, Hp, True,
        jnp.float32(1.0), jnp.float32(1.0), chunk=N))()
    F2, s2 = jax.jit(lambda: max_et_estep_pallas(
        y, weight, W, jnp.float32(0.8), lo, sa, Hp, True,
        jnp.float32(1.0), jnp.float32(1.0), tile=32, interpret=True))()
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=3e-5, atol=2e-4, err_msg=k)
    assert np.all(np.isfinite(np.asarray(F2)))


@pytest.mark.parametrize("magnitude", [False, True])
@pytest.mark.parametrize("beta,prior_beta", [(1.0, 1.0), (0.6, 0.6)])
def test_max_dtiled_matches_xla(magnitude, beta, prior_beta):
    """Round-4 D-tiled two-pass kernel (the patches-config path where the
    resident lattice exceeds VMEM): must reproduce the XLA E-step at f32
    tolerance, including D not a multiple of d_block (zero-row padding)."""
    from prosper_tpu.ops.max_pallas import max_et_estep_pallas_dtiled

    D, H, Hp, gamma, N = 24, 20, 5, 3, 96      # D=24, d_block=8 -> n_d=3
    sa, W, y = _setup(D, H, Hp, gamma, N, 13, magnitude)
    weight = jnp.asarray(
        np.random.default_rng(5).random(N) < 0.8, jnp.float32)
    lo = jnp.float32(np.log(0.12 / 0.88))
    s2 = jnp.float32(1.1)
    b, pb = jnp.float32(beta), jnp.float32(prior_beta)

    F1, s1 = jax.jit(lambda: max_et_estep(
        y, weight, W, s2, lo, sa, Hp, magnitude, b, pb, chunk=N))()
    F2, s2_ = jax.jit(lambda: max_et_estep_pallas_dtiled(
        y, weight, W, s2, lo, sa, Hp, magnitude, b, pb, tile=32,
        d_block=8, interpret=True))()
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=1e-4)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2_[k]),
                                   rtol=3e-5, atol=2e-4, err_msg=k)


def test_max_dtiled_pads_D_and_N():
    """D=20 with d_block=8 pads two zero rows; N=100 with tile=32 pads 28
    weight-0 lanes — both must leave F and every sum unchanged."""
    from prosper_tpu.ops.max_pallas import max_et_estep_pallas_dtiled

    D, H, Hp, gamma, N = 20, 16, 4, 3, 100
    sa, W, y = _setup(D, H, Hp, gamma, N, 17, False)
    weight = jnp.ones((N,), jnp.float32)
    lo = jnp.float32(np.log(0.2 / 0.8))
    F1, s1 = jax.jit(lambda: max_et_estep(
        y, weight, W, jnp.float32(1.0), lo, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), chunk=N))()
    F2, s2 = jax.jit(lambda: max_et_estep_pallas_dtiled(
        y, weight, W, jnp.float32(1.0), lo, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), tile=32, d_block=8,
        interpret=True))()
    assert F2.shape == (N,)
    assert s2["numer"].shape == (H, D) and s2["denom"].shape == (H, D)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=1e-4)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=3e-5, atol=2e-4, err_msg=k)


def test_max_dtiled_saturated_skips_true_channel():
    """collect_true=False: F_true must equal F exactly (static drop)."""
    from prosper_tpu.ops.max_pallas import max_et_estep_pallas_dtiled

    D, H, Hp, gamma, N = 16, 16, 4, 3, 64
    sa, W, y = _setup(D, H, Hp, gamma, N, 19, False)
    weight = jnp.ones((N,), jnp.float32)
    lo = jnp.float32(np.log(0.2 / 0.8))
    F, s = jax.jit(lambda: max_et_estep_pallas_dtiled(
        y, weight, W, jnp.float32(1.0), lo, sa, Hp, False,
        jnp.float32(1.0), jnp.float32(1.0), tile=32, d_block=8,
        interpret=True, collect_true=False))()
    np.testing.assert_allclose(float(s["F"]), float(s["F_true"]), rtol=0)
