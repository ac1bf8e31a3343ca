"""Structural/property tests of the ET E-step (beyond oracle equality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosper_tpu.core.etstep import linear_et_estep, state_arrays_from
from prosper_tpu.core.states import discrete_state_space


@pytest.fixture(scope="module")
def setup():
    N, D, H, Hp, gamma = 48, 10, 8, 5, 3
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((N, D)) * 1.5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    sa = state_arrays_from(discrete_state_space(Hp, gamma, [1.0]))
    lo = jnp.asarray([np.log(0.2 / 0.8)], jnp.float32)
    ones = jnp.ones((N,), jnp.float32)
    return y, W, sa, lo, ones, Hp


def _run(y, W, sa, lo, w, Hp, sigma2=1.2):
    return linear_et_estep(y, w, W, jnp.float32(sigma2), lo, sa, Hp, False,
                           jnp.float32(1.0), jnp.float32(1.0), chunk=4096)


def test_suffstats_permutation_invariant(setup):
    """Summed sufficient statistics must not depend on datapoint order."""
    y, W, sa, lo, ones, Hp = setup
    _, s1 = _run(y, W, sa, lo, ones, Hp)
    perm = np.random.default_rng(3).permutation(y.shape[0])
    _, s2 = _run(y[perm], W, sa, lo, ones, Hp)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_ss_matrix_symmetric_psd(setup):
    """sum_n <s s^T> is symmetric positive semidefinite by construction."""
    y, W, sa, lo, ones, Hp = setup
    _, sums = _run(y, W, sa, lo, ones, Hp)
    ss = np.asarray(sums["ss"], np.float64)
    np.testing.assert_allclose(ss, ss.T, atol=1e-4)
    evals = np.linalg.eigvalsh((ss + ss.T) / 2)
    assert evals.min() > -1e-3


def test_high_noise_limit_recovers_prior(setup):
    """sigma -> large: the likelihood flattens and the posterior mean
    activity approaches the truncated-prior expectation."""
    from prosper_tpu.core.etstep import truncated_prior_logmass
    y, W, sa, lo, ones, Hp = setup
    H = W.shape[1]
    _, sums = _run(y, W, sa, lo, ones, Hp, sigma2=1e6)
    mean_abs = float(sums["abs"] / sums["n"])
    logA, logB = truncated_prior_logmass(jnp.log(jnp.float32(0.2)), H, 3)
    # E[|s|] under the truncated prior = B/A, but the ET union truncates the
    # candidate support too; require the same order of magnitude and the
    # direction (far below H*pi of the full prior times N)
    e_trunc = float(jnp.exp(logB - logA))
    assert 0.3 * e_trunc < mean_abs < 2.0 * e_trunc


def test_zero_weight_rows_contribute_nothing(setup):
    """weight=0 rows must leave every summed statistic untouched."""
    y, W, sa, lo, ones, Hp = setup
    N = y.shape[0]
    half = jnp.asarray((np.arange(N) < N // 2).astype(np.float32))
    _, s_half = _run(y, W, sa, lo, half, Hp)
    _, s_sub = _run(y[: N // 2], W, sa, lo, ones[: N // 2], Hp)
    for k in s_half:
        np.testing.assert_allclose(np.asarray(s_half[k]),
                                   np.asarray(s_sub[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_better_dictionary_higher_likelihood(setup):
    """Data generated from W must score higher under W than under a random
    dictionary (free-energy sanity)."""
    y, W, sa, lo, ones, Hp = setup
    rng = np.random.default_rng(9)
    s = (rng.random((64, W.shape[1])) < 0.2).astype(np.float32)
    y_gen = jnp.asarray(s @ np.asarray(W).T
                        + 0.5 * rng.standard_normal((64, W.shape[0])),
                        jnp.float32)
    w64 = jnp.ones((64,), jnp.float32)
    F_true, _ = _run(y_gen, W, sa, lo, w64, Hp, sigma2=0.25)
    W_rand = jnp.asarray(rng.standard_normal(np.asarray(W).shape),
                         jnp.float32)
    F_rand, _ = _run(y_gen, W_rand, sa, lo, w64, Hp, sigma2=0.25)
    assert float(jnp.mean(F_true)) > float(jnp.mean(F_rand))


def test_top_l_argmax_matches_lax_top_k():
    """The decode-path iterated-argmax top-L (core/select.py) must match
    lax.top_k exactly on probability-like inputs, including ties."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from prosper_tpu.core.select import top_l_argmax

    rng = np.random.default_rng(0)
    q = rng.random((64, 37)).astype(np.float32)
    q[:8, 5] = q[:8, 11]                       # planted ties
    q = jnp.asarray(q)
    for L in (1, 4, 37):
        v1, i1 = jax.lax.top_k(q, L)
        v2, i2 = top_l_argmax(q, L)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    with pytest.raises(ValueError):
        top_l_argmax(q, 38)
