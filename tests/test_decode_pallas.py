"""Fused decode kernel vs the XLA posterior decode (round 5, VERDICT r4 #3).

The pallas decode (`ops/linear_pallas.py::linear_et_decode_pallas`, run
here in interpret mode on CPU) must reproduce the XLA path's full output
contract — F, s_mean, recon, top_probs, and the EXACT top-state identities
(canonical union indices incl. lowest-index tie-break) — for both the
dense and compact layouts, for unsigned (BSC) and signed (TSC) selection.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prosper_tpu.core.etstep import (densify_top_states, linear_et_posterior,
                                     linear_et_posterior_pallas,
                                     state_arrays_from)
from prosper_tpu.core.states import discrete_state_space


def _setup(values, seed=0, N=100, D=12, H=11, Hp=5, gamma=3):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    space = discrete_state_space(Hp, gamma, list(values))
    sa = state_arrays_from(space)
    K = len(values)
    pi = 0.4 / (H * K)
    log_odds = jnp.full((K,), np.float32(np.log(pi) - np.log1p(-K * pi)))
    return y, W, sa, log_odds, Hp


@pytest.mark.parametrize("values,signed", [((1.0,), False),
                                           ((-1.0, 1.0), True)])
@pytest.mark.parametrize("dense", [True, False])
def test_decode_kernel_matches_xla(values, signed, dense):
    y, W, sa, log_odds, Hp = _setup(values)
    kw = dict(sigma2=jnp.float32(0.8 ** 2), log_odds=log_odds, sa=sa,
              Hp=Hp, signed_select=signed, top_L=7,
              beta=jnp.float32(1.0), prior_beta=jnp.float32(1.0),
              dense_states=dense)
    ref = linear_et_posterior(y, W, chunk=32, **kw)       # chunked XLA path
    out = linear_et_posterior_pallas(y, W, interpret=True, **kw)

    np.testing.assert_allclose(np.asarray(out["F"]), np.asarray(ref["F"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["s_mean"]),
                               np.asarray(ref["s_mean"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["recon"]),
                               np.asarray(ref["recon"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["top_probs"]),
                               np.asarray(ref["top_probs"]),
                               rtol=1e-4, atol=1e-6)
    if dense:
        # exact identity: random f32 data has no ties, so the per-state
        # vectors must match exactly (values come from the same tables)
        np.testing.assert_array_equal(np.asarray(out["top_states"]),
                                      np.asarray(ref["top_states"]))
    else:
        for k in ("top_single_unit", "top_single_value",
                  "top_cand_states", "cand"):
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(ref[k]), err_msg=k)


def test_decode_kernel_annealed_and_densify():
    """beta/prior_beta != 1 flow through the kernel's scalars; the compact
    output densifies to the dense tensor bit-identically."""
    y, W, sa, log_odds, Hp = _setup((1.0,), seed=3)
    kw = dict(sigma2=jnp.float32(1.1 ** 2), log_odds=log_odds, sa=sa,
              Hp=Hp, signed_select=False, top_L=5,
              beta=jnp.float32(0.5), prior_beta=jnp.float32(0.7))
    ref = linear_et_posterior(y, W, chunk=64, dense_states=True, **kw)
    out = linear_et_posterior_pallas(y, W, interpret=True,
                                     dense_states=False, **kw)
    np.testing.assert_allclose(np.asarray(out["F"]), np.asarray(ref["F"]),
                               rtol=2e-5, atol=2e-5)
    dense = densify_top_states(out, W.shape[1])
    np.testing.assert_array_equal(np.asarray(dense),
                                  np.asarray(ref["top_states"]))


def test_model_inference_uses_kernel_and_matches():
    """BSC(backend='pallas').inference must equal the XLA-backend decode
    (end-to-end through the model API, interpret mode on CPU)."""
    from prosper_tpu.models.linear import BSC

    rng = np.random.default_rng(9)
    D, H = 64, 72                      # above the kernel's production gates
    y = rng.standard_normal((96, D)).astype(np.float32)
    W = rng.standard_normal((D, H)).astype(np.float32)
    params = {"W": jnp.asarray(W), "pi": jnp.float32(0.03),
              "sigma": jnp.float32(1.0)}
    m_xla = BSC(D, H, 5, 3, backend="xla")
    m_pl = BSC(D, H, 5, 3, backend="pallas")
    m_pl._pallas_interpret = True
    ref = m_xla.inference(params, {"y": y}, top_L=4)
    out = m_pl.inference(params, {"y": y}, top_L=4)
    assert set(out.keys()) == set(ref.keys())
    np.testing.assert_allclose(np.asarray(out["F"]), np.asarray(ref["F"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out["top_states"]),
                                  np.asarray(ref["top_states"]))
