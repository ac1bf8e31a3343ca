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

MXU-pass shape (round-3 ablation, tools/ablate_bigs.py): a first version
issued SIX GEMMs per grid step — lik as dot(st, projT) + dot(ot, GfT)
(contractions 10 and 100) and four separate moment GEMMs with 10/100/K/1-row
outputs — ~18 mostly-empty 128-wide MXU passes per step, measured only +5%
over the XLA scan.  Operands are therefore concatenated host-side so each
step is TWO dense GEMMs, and (round 5, mirroring the XLA scan's merged
body) those GEMMs carry EVERYTHING — the prior (hi+lo bf16 split), the
beta/inv2s2 scales, the padded-state mask, and the softmax mass all fold
into extra contraction columns, so no per-step VPU FMA or reduce pass
survives besides the softmax max/exp themselves:

  logits = dot(cat, pg)   cat = [2*st | -ot | p_hi | p_lo | inval]
                                                   (s_block, Hp+Hp^2+3)
                          pg  = [b*i2s*projT ; b*i2s*GfT ; pb ; pb ; neg]
                                                   (Hp+Hp^2+3, Ct)
  moments= dot_general(mom, p, contract s_block)
                          mom = [st|ot|vcounts|abs|1] (s_block, Mtot)

i.e. one contraction-(Hp+Hp^2+3) pass plus ceil(s_block/128) passes with an
~Mtot/128-full output tile — ~5 passes per step instead of ~18.

Orientation: datapoints ride the LANE dimension (Ct multiple of 128) so
state-block rows sit on sublanes; the moment GEMM contracts over the
s_block (sublane) axis.

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


# exp implementations for the softmax recurrence — the kernel is VPU-
# transcendental-bound at big S (each datapoint evaluates S exps; see the
# roofline note in bigs_multi_pallas), so the lowering of exp IS the
# bottleneck.  'exp2' computes exp(x) = exp2(x * log2 e) — exact algebra,
# potentially cheaper lowering; '_floor' replaces exp with a multiply and
# exists ONLY to measure the non-transcendental floor in tools/probe_* —
# the leading underscore marks it as a measurement placebo that CORRUPTS
# posteriors (ADVICE r3: never select it outside the probe tools).
_LOG2E = 1.4426950408889634
_EXP_IMPLS = {
    "exp": jnp.exp,
    "exp2": lambda x: jnp.exp2(x * _LOG2E),
    "_floor": lambda x: x * 1.0009765625 + 1.0,
}


def _resolve_exp_impl(name: str):
    try:
        return _EXP_IMPLS[name]
    except KeyError:
        raise ValueError(
            f"unknown exp_impl {name!r}; valid: {sorted(_EXP_IMPLS)} "
            "('_floor' is a benchmark placebo that corrupts posteriors — "
            "probe tools only)") from None


def _kernel(*refs, s_block: int, Ct: int, Mtot: int, collect_true: bool,
            expfn=jnp.exp):
    if collect_true:
        pg_ref, pg_t_ref, cat_ref, mom_ref, misc_ref, acc_ref = refs
    else:
        (pg_ref, cat_ref, mom_ref, misc_ref, acc_ref), pg_t_ref = refs, None
    j = pl.program_id(1)
    f32 = jnp.float32
    neg = jnp.float32(-3e38)

    @pl.when(j == 0)
    def _():
        misc_ref[:] = jnp.concatenate(
            [jnp.full((1, Ct), neg, f32),
             jnp.full((1, Ct), neg, f32), jnp.zeros((1, Ct), f32),
             jnp.zeros((5, Ct), f32)], axis=0)
        acc_ref[:] = jnp.zeros((Mtot, Ct), f32)

    cat = cat_ref[:]   # (s_block, nA) bf16: [2st | -ot | p_hi | p_lo | inval]
    mom = mom_ref[:]   # (s_block, Mtot) bf16: [st|ot|vc|abs|1]
    pg = pg_ref[:]     # (nA, Ct) bf16: [beta*inv2s2*projT ; beta*inv2s2*GfT ;
    #                    prior_beta*1 ; prior_beta*1 ; neg*1]

    # ONE GEMM produces the finished logits: the per-state prior rides as a
    # contraction column against a prior_beta row, the padded-state mask as
    # an indicator column against a neg row, and beta*inv2s2 folds into the
    # projection rows host-side — the old per-step `beta*lik + bias` VPU
    # FMA pass over (s_block, Ct) disappears (round 5; same fold as the XLA
    # scan's merged-GEMM body in core/etstep.py).
    # bf16 multiply, f32 accumulate — identical to jnp.dot's DEFAULT TPU
    # precision in the XLA scan (round-1 note: default matmul already
    # multiplies in bf16).  Keeping the operands f32 forced Mosaic into the
    # multi-pass full-f32 MXU path, ~6x the passes — measured 1.45 ms of the
    # 2.8 ms/chunk kernel time at S=12,564.
    logits = jnp.dot(cat, pg, preferred_element_type=f32)

    misc = misc_ref[:]
    m_old = misc[0:1, :]
    mt_old = misc[1:2, :]
    lt_old = misc[2:3, :]

    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    r = expfn(m_old - m_new)                          # (1, Ct)
    p = expfn(logits - m_new)                         # (s_block, Ct)

    # the softmax mass accumulates as the `1` column of the moment GEMM
    # (one more contraction row is free; the old separate jnp.sum over
    # (s_block, Ct) was a full VPU reduce pass)
    dn = (((0,), (0,)), ((), ()))        # contract the s_block (sublane) dim
    acc_ref[:] = acc_ref[:] * r + jax.lax.dot_general(
        mom, p.astype(mom.dtype), dn,
        preferred_element_type=f32)                   # (Mtot, Ct)

    # un-annealed (true) channel: its own fully-folded logits GEMM sharing
    # `cat` (prior_beta == 1, no beta scaling); statically dropped in the
    # saturated steady state (beta == prior_beta == 1 -> F_true == F) where
    # its exp is half the kernel's VPU work
    if collect_true:
        logits_t = jnp.dot(cat, pg_t_ref[:], preferred_element_type=f32)
        mt_new = jnp.maximum(mt_old,
                             jnp.max(logits_t, axis=0, keepdims=True))
        lt_new = (lt_old * expfn(mt_old - mt_new)
                  + jnp.sum(expfn(logits_t - mt_new), axis=0,
                            keepdims=True))
    else:
        mt_new, lt_new = mt_old, lt_old

    misc_ref[:] = jnp.concatenate(
        [m_new, mt_new, lt_new, misc[3:, :]], axis=0)


def bigs_multi_pallas(proj: jnp.ndarray, Gf: jnp.ndarray,
                      states_p: jnp.ndarray, outer_p: jnp.ndarray,
                      vcounts_p: jnp.ndarray, prior: jnp.ndarray,
                      valid: jnp.ndarray, absst_p: jnp.ndarray,
                      inv2s2, beta, prior_beta, s_block: int,
                      tile: int = 1024, interpret: bool = False,
                      collect_true: bool = True, precise: bool = False,
                      exp_impl: str = "exp"
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
    # ``precise`` keeps the GEMM operands f32 (the slow multi-pass MXU
    # path) — used by the equality tests to verify the kernel's ALGEBRA at
    # tight tolerance, independent of the bf16 precision policy
    bf16 = jnp.float32 if precise else jnp.bfloat16
    neg = jnp.float32(-3e38)
    # fully-folded logits operand (round 5 — the same merged-GEMM fold as
    # the XLA scan body in core/etstep.py): ONE GEMM emits finished logits.
    #   cat = [2*st | -ot | prior | invalid]            (s_block, nA)
    #   pg  = [beta*inv2s2*projT ; beta*inv2s2*GfT ;
    #          prior_beta*1 ; neg*1]                    (nA, Ct)
    # beta/inv2s2/prior_beta/the padding mask all fold host-side, so the
    # kernel's per-step `beta*lik + bias` FMA pass over (s_block, Ct)
    # disappears.  Operands cast to bf16 so Mosaic emits the single-pass
    # bf16-multiply/f32-accumulate MXU form — the same semantics jnp.dot
    # uses at default TPU precision in the XLA scan (f32 operands forced
    # the ~6x multi-pass full-f32 path, measured 1.45 ms of the 2.8
    # ms/chunk kernel time).
    Cp = C + pad
    n_dp = Cp // tile
    n_s = S_loc // s_block
    nA = Hp + Hp2 + 3

    projT = jnp.pad(proj, ((0, pad), (0, 0))).T
    GfT = jnp.pad(Gf, ((0, pad), (0, 0))).T
    sc = jnp.asarray(inv2s2, f32)
    b_sc = jnp.asarray(beta, f32) * sc
    ones_row = jnp.ones((1, Cp), f32)
    pb_row = jnp.asarray(prior_beta, f32) * ones_row
    pg = jnp.concatenate([b_sc * projT, b_sc * GfT,
                          pb_row, pb_row, neg * ones_row],
                         axis=0).astype(bf16)

    st = states_p.astype(f32)
    ot = outer_p.astype(f32)
    # state entries and their products are small integers — exact in bf16.
    # The prior rides as a hi+lo bf16 column PAIR (Dekker split: lo is the
    # f32 remainder after bf16-rounding hi), so the fold loses nothing vs
    # the old f32 bias-add — one extra contraction column is free
    p_hi = prior.astype(jnp.bfloat16).astype(f32)
    p_lo = prior - p_hi
    cat = jnp.concatenate([2.0 * st, -ot, p_hi[:, None], p_lo[:, None],
                           (1.0 - valid)[:, None]], axis=1).astype(bf16)
    # fused moment operand: one (s_block, Mtot) GEMM accumulates
    # <s>, <ss^T>, value counts, |s| AND the softmax mass (the `1` column)
    # together; rows pad to a multiple of 16 (bf16 sublane tile) with
    # zeros — they accumulate zeros
    mom = jnp.concatenate(
        [st, ot, vcounts_p.astype(f32), absst_p.astype(f32)[:, None],
         jnp.ones((S_loc, 1), f32)], axis=1)
    Mraw = Hp + Hp2 + K + 2
    Mtot = -(-Mraw // 16) * 16
    mom = jnp.pad(mom, ((0, 0), (0, Mtot - Mraw))).astype(bf16)

    kernel = partial(_kernel, s_block=s_block, Ct=tile, Mtot=Mtot,
                     collect_true=collect_true,
                     expfn=_resolve_exp_impl(exp_impl))
    in_specs = [pl.BlockSpec((nA, tile), lambda i, j: (0, i))]       # pg
    operands = [pg]
    if collect_true:
        # un-annealed channel: same cat, its own folded row block
        pg_t = jnp.concatenate([sc * projT, sc * GfT, ones_row, ones_row,
                                neg * ones_row], axis=0).astype(bf16)
        in_specs.append(pl.BlockSpec((nA, tile), lambda i, j: (0, i)))
        operands.append(pg_t)
    in_specs += [
        pl.BlockSpec((s_block, nA), lambda i, j: (j, 0)),            # cat
        pl.BlockSpec((s_block, Mtot), lambda i, j: (j, 0)),          # mom
    ]
    operands += [cat, mom]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_dp, n_s),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((8, tile), lambda i, j: (0, i)),         # misc
            pl.BlockSpec((Mtot, tile), lambda i, j: (0, i)),      # acc
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((8, Cp), f32),
        jax.ShapeDtypeStruct((Mtot, Cp), f32),
    )
    misc, acc = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(*operands)

    a_s = acc[0:Hp, :C].T
    a_ss = acc[Hp:Hp + Hp2, :C].T
    a_vc = acc[Hp + Hp2:Hp + Hp2 + K, :C].T
    a_abs = acc[Hp + Hp2 + K, :C]
    l_b = acc[Hp + Hp2 + K + 1, :C]
    return (misc[0, :C], l_b, misc[1, :C], misc[2, :C],
            a_abs, a_s, a_ss, a_vc)
