"""Fused Pallas TPU kernel for the big-S (S-blocked) linear-family E-step.

Reference behavior: SURVEY.md §2 "TSC/DSC-ET" at combinatorially large
enumerated state spaces (§5.7's motivating regime, S ~ 1e4-1e5+).

Why a kernel (VERDICT r2 weak #4): the XLA s_block scan keeps (C, S) off
HBM but each scan step still round-trips ~5 (chunk, s_block) f32 tensors
(lik, logits, p, the true-channel pair) through fusion boundaries — at
chunk=8192, s_block=512 that is ~16 MB x 5 x nblocks per chunk, and the
measured 3.66 M dp/s at S=12,564 is exactly that HBM roofline.  Here the
whole flash-attention-style recurrence lives in VMEM: the (s_block, Ct)
logits tile, the running (max, mass) pair, and the (Hp/Hp^2/K) moment
accumulators never touch HBM; the state tables (states/outer/value-counts)
stream in via the second grid dimension, datapoints via the first.

Orientation: datapoints ride the LANE dimension (Ct multiple of 128) so
state-block rows sit on sublanes — the lik GEMM is (s_block, Hp^2) x
(Hp^2, Ct), contraction ~Hp^2 (near-full MXU occupancy at Hp=10), and the
moment GEMMs contract over the s_block (sublane) axis.

The kernel computes ONLY the multi-state recurrence; the zero/singleton
closed forms, the partial-softmax combine, and the sufficient-statistic
assembly stay in XLA (core/etstep.py::_chunk_estats_bigs) — they touch
(C, Hp^2)-sized data, which is not the bottleneck.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scal_ref, projT_ref, GfT_ref, st_ref, ot_ref, vc_ref, ex_ref,
            misc_ref, as_ref, ass_ref, avc_ref,
            *, s_block: int, Ct: int, Hp: int, K: int):
    j = pl.program_id(1)
    f32 = jnp.float32
    neg = jnp.float32(-3e38)

    inv2s2 = scal_ref[0, 0]
    beta = scal_ref[0, 1]
    prior_beta = scal_ref[0, 2]

    @pl.when(j == 0)
    def _():
        misc_ref[:] = jnp.concatenate(
            [jnp.full((1, Ct), neg, f32), jnp.zeros((1, Ct), f32),
             jnp.full((1, Ct), neg, f32), jnp.zeros((1, Ct), f32),
             jnp.zeros((4, Ct), f32)], axis=0)
        as_ref[:] = jnp.zeros((Hp, Ct), f32)
        ass_ref[:] = jnp.zeros((Hp * Hp, Ct), f32)
        avc_ref[:] = jnp.zeros((K, Ct), f32)

    st = st_ref[:]                       # (s_block, Hp)
    ot = ot_ref[:]                       # (s_block, Hp^2)
    vc = vc_ref[:]                       # (s_block, K)
    ex = ex_ref[:]                       # (s_block, 3): prior, valid, absst
    projT = projT_ref[:]                 # (Hp, Ct)
    GfT = GfT_ref[:]                     # (Hp^2, Ct)

    prior = ex[:, 0:1]                   # (s_block, 1)
    valid = ex[:, 1:2]
    absst = ex[:, 2:3]

    lik = (2.0 * jnp.dot(st, projT, preferred_element_type=f32)
           - jnp.dot(ot, GfT, preferred_element_type=f32)) * inv2s2
    logits = beta * lik + prior_beta * prior
    logits = jnp.where(valid > 0, logits, neg)        # (s_block, Ct)

    misc = misc_ref[:]
    m_old = misc[0:1, :]
    l_old = misc[1:2, :]
    mt_old = misc[2:3, :]
    lt_old = misc[3:4, :]
    aabs_old = misc[4:5, :]

    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    r = jnp.exp(m_old - m_new)                        # (1, Ct)
    p = jnp.exp(logits - m_new)                       # (s_block, Ct)
    l_new = l_old * r + jnp.sum(p, axis=0, keepdims=True)

    dn = (((0,), (0,)), ((), ()))        # contract the s_block (sublane) dim
    as_ref[:] = as_ref[:] * r + jax.lax.dot_general(
        st, p, dn, preferred_element_type=f32)        # (Hp, Ct)
    ass_ref[:] = ass_ref[:] * r + jax.lax.dot_general(
        ot, p, dn, preferred_element_type=f32)        # (Hp^2, Ct)
    avc_ref[:] = avc_ref[:] * r + jax.lax.dot_general(
        vc, p, dn, preferred_element_type=f32)        # (K, Ct)
    aabs_new = aabs_old * r + jax.lax.dot_general(
        absst, p, dn, preferred_element_type=f32)     # (1, Ct)

    # un-annealed (true) channel: max/mass only
    logits_t = jnp.where(valid > 0, lik + prior, neg)
    mt_new = jnp.maximum(mt_old, jnp.max(logits_t, axis=0, keepdims=True))
    lt_new = (lt_old * jnp.exp(mt_old - mt_new)
              + jnp.sum(jnp.exp(logits_t - mt_new), axis=0, keepdims=True))

    misc_ref[:] = jnp.concatenate(
        [m_new, l_new, mt_new, lt_new, aabs_new, misc[5:, :]], axis=0)


def bigs_multi_pallas(proj: jnp.ndarray, Gf: jnp.ndarray,
                      states_p: jnp.ndarray, outer_p: jnp.ndarray,
                      vcounts_p: jnp.ndarray, prior: jnp.ndarray,
                      valid: jnp.ndarray, absst_p: jnp.ndarray,
                      inv2s2, beta, prior_beta, s_block: int,
                      tile: int = 512, interpret: bool = False
                      ) -> Tuple[jnp.ndarray, ...]:
    """Multi-state online-logsumexp recurrence, fused.

    proj (C, Hp), Gf (C, Hp^2) — per-datapoint candidate projections;
    states_p/outer_p/vcounts_p/absst_p/prior/valid — the (S_loc,) state
    tables already padded to an s_block multiple (same contract as the
    XLA scan in _chunk_estats_bigs).  Returns (m, l, m_t, l_t, a_abs,
    a_s, a_ss, a_vc) with datapoint-leading shapes matching the scan's
    carry — the caller's combine/sufficient-statistic code is shared.
    """
    C, Hp = proj.shape
    Hp2 = Gf.shape[1]
    K = vcounts_p.shape[1]
    S_loc = states_p.shape[0]
    assert S_loc % s_block == 0
    f32 = jnp.float32

    pad = (-C) % tile
    projT = jnp.pad(proj, ((0, pad), (0, 0))).T       # (Hp, C+pad)
    GfT = jnp.pad(Gf, ((0, pad), (0, 0))).T           # (Hp^2, C+pad)
    Cp = C + pad
    n_dp = Cp // tile
    n_s = S_loc // s_block

    ex = jnp.stack([prior, valid, absst_p], axis=1).astype(f32)  # (S_loc, 3)
    scal = jnp.stack([jnp.asarray(inv2s2, f32), jnp.asarray(beta, f32),
                      jnp.asarray(prior_beta, f32)])[None, :]

    kernel = partial(_kernel, s_block=s_block, Ct=tile, Hp=Hp, K=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_dp, n_s),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp, tile), lambda i, j: (0, i)),       # projT
            pl.BlockSpec((Hp2, tile), lambda i, j: (0, i)),      # GfT
            pl.BlockSpec((s_block, Hp), lambda i, j: (j, 0)),    # states
            pl.BlockSpec((s_block, Hp2), lambda i, j: (j, 0)),   # outer
            pl.BlockSpec((s_block, K), lambda i, j: (j, 0)),     # vcounts
            pl.BlockSpec((s_block, 3), lambda i, j: (j, 0)),     # extras
        ],
        out_specs=[
            pl.BlockSpec((8, tile), lambda i, j: (0, i)),        # misc
            pl.BlockSpec((Hp, tile), lambda i, j: (0, i)),       # a_s
            pl.BlockSpec((Hp2, tile), lambda i, j: (0, i)),      # a_ss
            pl.BlockSpec((K, tile), lambda i, j: (0, i)),        # a_vc
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((8, Cp), f32),
        jax.ShapeDtypeStruct((Hp, Cp), f32),
        jax.ShapeDtypeStruct((Hp2, Cp), f32),
        jax.ShapeDtypeStruct((K, Cp), f32),
    )
    misc, a_s, a_ss, a_vc = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(scal, projT, GfT, states_p.astype(f32), outer_p.astype(f32),
      vcounts_p.astype(f32), ex)

    return (misc[0, :C], misc[1, :C], misc[2, :C], misc[3, :C],
            misc[4, :C], a_s[:, :C].T, a_ss[:, :C].T, a_vc[:, :C].T)
