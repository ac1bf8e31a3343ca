"""Fused big-S kernel vs the XLA s_block scan (interpret mode on CPU).

Contract: `linear_et_estep(..., s_block, pallas_bigs=True)` must reproduce
the XLA s_block path's per-datapoint F and every summed sufficient
statistic at f32 tolerance — including annealed (beta, prior_beta),
non-divisible S (padded state blocks), non-divisible N vs the lane tile,
and the full jit_step wiring via backend='pallas' + s_block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosper_tpu.core.etstep import linear_et_estep, state_arrays_from
from prosper_tpu.core.states import discrete_state_space


def _setup(D, H, Hp, gamma, N, seed, values=(1.0,)):
    rng = np.random.default_rng(seed)
    space = discrete_state_space(Hp, gamma, values)
    sa = state_arrays_from(space)
    W = rng.standard_normal((D, H)).astype(np.float32)
    y = rng.standard_normal((N, D)).astype(np.float32) * 1.5
    lo = jnp.asarray(np.log(0.1 / 0.9) * np.ones(len(values)), np.float32)
    return sa, jnp.asarray(W), jnp.asarray(y), lo


@pytest.mark.parametrize("beta,prior_beta", [(1.0, 1.0), (0.6, 1.0),
                                             (0.8, 0.8)])
@pytest.mark.parametrize("values", [(1.0,), (-1.0, 1.0)])
def test_bigs_pallas_matches_scan(beta, prior_beta, values):
    D, H, Hp, gamma, N = 16, 24, 6, 4, 128
    sa, W, y, lo = _setup(D, H, Hp, gamma, N, 3, values)
    weight = jnp.asarray(
        np.random.default_rng(4).random(N) < 0.85, jnp.float32)
    signed = len(values) > 1
    args = (y, weight, W, jnp.float32(1.2), lo, sa, Hp, signed,
            jnp.float32(beta), jnp.float32(prior_beta))
    # s_block=16 does NOT divide S -> exercises state padding; the lane
    # tile inside the kernel pads N=128 up to the 512-lane default
    F1, s1 = jax.jit(lambda: linear_et_estep(
        *args, chunk=N, s_block=16))()
    # precise=True keeps the kernel's GEMM operands f32 so the ALGEBRA is
    # verified at tight tolerance; the production bf16-operand policy (the
    # same semantics jnp.dot uses on TPU by default) is covered by the
    # loose-tolerance test below and the on-chip backends_match bench field
    F2, s2 = jax.jit(lambda: linear_et_estep(
        *args, chunk=N, s_block=16, pallas_bigs=True,
        pallas_interpret=True, pallas_precise=True))()
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=2e-5, atol=1e-4)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=5e-5, atol=2e-4, err_msg=k)


def test_bigs_pallas_bf16_policy_close():
    """The production bf16-multiply/f32-accumulate kernel stays within
    bf16-roundoff of the f32 scan (interpret mode honours the casts)."""
    D, H, Hp, gamma, N = 16, 24, 6, 4, 128
    sa, W, y, lo = _setup(D, H, Hp, gamma, N, 11, (1.0,))
    weight = jnp.ones((N,), jnp.float32)
    args = (y, weight, W, jnp.float32(1.2), lo, sa, Hp, False,
            jnp.float32(0.9), jnp.float32(1.0))
    F1, s1 = jax.jit(lambda: linear_et_estep(*args, chunk=N, s_block=16))()
    F2, s2 = jax.jit(lambda: linear_et_estep(
        *args, chunk=N, s_block=16, pallas_bigs=True,
        pallas_interpret=True))()
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F2),
                               rtol=5e-3, atol=5e-3)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=1e-2, atol=5e-2, err_msg=k)


@pytest.mark.parametrize("saturated", [False, True])
@pytest.mark.parametrize("precise", [True, False])
def test_bigs_pallas_model_step_wiring(precise, saturated):
    """backend='pallas' + s_block routes the jit_step through the fused
    kernel and matches the XLA model, zero-weight rows included — in BOTH
    step specializations (saturated drops the kernel's un-annealed
    channel; annealed runs it).  precise verifies the algebra at tight
    tolerance; precise=False covers the PRODUCTION bf16-operand policy
    through the model wiring (ADVICE r3) at bf16-roundoff tolerances."""
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    from prosper_tpu.models.linear import TSC

    D, H, Hp, gamma, N = 16, 20, 6, 4, 96
    rng = np.random.default_rng(7)
    y = rng.standard_normal((N, D)).astype(np.float32)
    params = None
    outs = {}
    for backend in ("xla", "pallas"):
        m = TSC(D, H, Hp, gamma, chunk=N, s_block=16, backend=backend)
        m._pallas_interpret = True
        m._pallas_precise = precise
        if params is None:
            params = m.standard_init({"y": y}, seed=5)
        data = make_blank_data(y, valid=np.r_[np.ones(80), np.zeros(16)])
        sched = sched_from_anneal(LinearAnnealing(10))
        p, F, s = m.jit_step(saturated=saturated)(params, data, sched,
                                                  jax.random.PRNGKey(0))
        outs[backend] = (p, np.asarray(F), np.asarray(s["F_mean"]))
    rt, at = (1e-4, 1e-5) if precise else (5e-3, 1e-2)
    for k in outs["xla"][0]:
        np.testing.assert_allclose(
            np.asarray(outs["xla"][0][k]), np.asarray(outs["pallas"][0][k]),
            rtol=rt, atol=at, err_msg=f"param {k}")
    np.testing.assert_allclose(outs["xla"][1], outs["pallas"][1],
                               rtol=max(2e-5, rt), atol=max(1e-4, at))
    np.testing.assert_allclose(outs["xla"][2], outs["pallas"][2],
                               rtol=max(1e-5, rt), atol=at)
