"""Fused Pallas E-step vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosper_tpu.core.etstep import linear_et_estep, state_arrays_from
from prosper_tpu.core.states import discrete_state_space
from prosper_tpu.ops.linear_pallas import linear_et_estep_pallas


@pytest.mark.parametrize("values,signed", [([1.0], False),
                                           ([-1.0, 1.0], True)])
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
