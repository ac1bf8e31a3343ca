"""Fused Pallas E-step vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosper_tpu.core.etstep import linear_et_estep, state_arrays_from
from prosper_tpu.core.states import discrete_state_space
from prosper_tpu.ops.linear_pallas import linear_et_estep_pallas


@pytest.mark.parametrize("values,signed", [([1.0], False),
                                           ([-1.0, 1.0], True),
                                           ([0.5, 1.0, 2.0], False)])
def test_pallas_matches_xla(values, signed):
    N, D, H, Hp, gamma = 64, 16, 12, 6, 3
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((N, D)) * 1.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    weight = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
    space = discrete_state_space(Hp, gamma, values)
    sa = state_arrays_from(space)
    pi = 0.2
    K = len(values)
    log_odds = jnp.asarray(np.full(K, np.log(pi / K / (1 - pi))), jnp.float32)
    args = (y, weight, W, jnp.float32(1.3), log_odds, sa, Hp, signed,
            jnp.float32(0.7), jnp.float32(1.0))

    F_x, sums_x = linear_et_estep(*args, chunk=4096)
    F_p, sums_p = linear_et_estep_pallas(*args, tile=32, interpret=True)

    np.testing.assert_allclose(np.asarray(F_p), np.asarray(F_x),
                               rtol=2e-4, atol=2e-4)
    for k in ("xs", "ss", "s", "vc", "abs", "y2", "n", "F", "F_true"):
        np.testing.assert_allclose(np.asarray(sums_p[k]),
                                   np.asarray(sums_x[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)


def _setup(N, D=16, H=12, Hp=6, gamma=3, values=(1.0,), seed=0,
           weight=None):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((N, D)) * 1.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    if weight is None:
        weight = (rng.random(N) > 0.2).astype(np.float32)
    weight = jnp.asarray(weight, jnp.float32)
    space = discrete_state_space(Hp, gamma, list(values))
    sa = state_arrays_from(space)
    pi = 0.2
    K = len(values)
    log_odds = jnp.asarray(np.full(K, np.log(pi / K / (1 - pi))), jnp.float32)
    return (y, weight, W, jnp.float32(1.3), log_odds, sa, Hp, False,
            jnp.float32(0.7), jnp.float32(1.0))


def _assert_match(args, **pallas_kw):
    F_x, sums_x = linear_et_estep(*args, chunk=4096)
    F_p, sums_p = linear_et_estep_pallas(*args, interpret=True, **pallas_kw)
    np.testing.assert_allclose(np.asarray(F_p), np.asarray(F_x),
                               rtol=2e-4, atol=2e-4)
    for k in ("xs", "ss", "s", "vc", "abs", "y2", "n", "F", "F_true"):
        np.testing.assert_allclose(np.asarray(sums_p[k]),
                                   np.asarray(sums_x[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)


@pytest.mark.parametrize("N", [33, 57, 100])
def test_pallas_non_divisible_n_padded(N):
    """ADVICE r1: any N must work on the library path — the tile remainder
    is padded with weight-0 rows inside the kernel wrapper."""
    _assert_match(_setup(N), tile=32)


def test_pallas_all_zero_weight_tile():
    """A tile whose rows all carry weight 0 (e.g. Ncut masked a whole chunk)
    must contribute exactly nothing."""
    w = np.ones(64, np.float32)
    w[32:] = 0.0                        # second 32-row tile fully masked
    _assert_match(_setup(64, weight=w), tile=32)


def test_pallas_zero_weight_everything():
    args = _setup(64, weight=np.zeros(64, np.float32))
    _, sums = linear_et_estep_pallas(*args, tile=32, interpret=True)
    for k in ("xs", "ss", "s", "vc", "abs", "y2", "n", "F", "F_true"):
        np.testing.assert_allclose(np.asarray(sums[k]), 0.0, atol=1e-6,
                                   err_msg=k)


def test_auto_tile_properties():
    """auto_tile must return a power-of-two >= 8 whose working set fits the
    VMEM budget (or the floor of 8 when nothing fits)."""
    from prosper_tpu.ops.linear_pallas import auto_tile

    for (N, D, H, Hp, S, K) in [(131072, 256, 300, 8, 367, 1),
                                (1000, 64, 100, 6, 42, 2),
                                (8, 16, 12, 6, 42, 1),
                                (7, 16, 12, 6, 42, 1),
                                (4096, 1024, 2048, 10, 1000, 3)]:
        t = auto_tile(N, D, H, Hp, S, K)
        assert t >= 8 and (t & (t - 1)) == 0, (N, t)
        per_row = 4 * (D + 3 * H + 2 * Hp * H + 3 * K * H + 3 * S + 64)
        assert t == 8 or t * per_row <= 10 * 1024 * 1024, (N, t)
        assert t <= max(N, 8) or t == 8
