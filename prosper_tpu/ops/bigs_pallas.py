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
over the XLA scan.  This version concatenates operands host-side so each
step is TWO dense GEMMs:

  lik    = dot(cat, pg)      cat = [2*states | -outer]      (s_block, Hp+Hp^2)
                             pg  = [projT ; GfT]            (Hp+Hp^2, Ct)
  moments= dot_general(mom, p, contract s_block)
                             mom = [states|outer|vcounts|abs] (s_block, Mtot)

i.e. one contraction-(Hp+Hp^2) pass plus ceil(s_block/128) passes with an
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


def _kernel(scal_ref, pg_ref, cat_ref, mom_ref, ex_ref,
            misc_ref, acc_ref,
            *, s_block: int, Ct: int, Mtot: int, collect_true: bool,
            expfn=jnp.exp):
    j = pl.program_id(1)
    f32 = jnp.float32
    neg = jnp.float32(-3e38)

    beta = scal_ref[0, 1]

    @pl.when(j == 0)
    def _():
        misc_ref[:] = jnp.concatenate(
            [jnp.full((1, Ct), neg, f32), jnp.zeros((1, Ct), f32),
             jnp.full((1, Ct), neg, f32), jnp.zeros((1, Ct), f32),
             jnp.zeros((4, Ct), f32)], axis=0)
        acc_ref[:] = jnp.zeros((Mtot, Ct), f32)

    cat = cat_ref[:]                     # (s_block, Hp+Hp^2) bf16: [2st|-ot]
    mom = mom_ref[:]                     # (s_block, Mtot) bf16: [st|ot|vc|abs]
    ex = ex_ref[:]                       # (s_block, 2) f32: bias, bias_true
    pg = pg_ref[:]                       # (Hp+Hp^2, Ct) bf16, inv2s2 folded

    # bias folds prior_beta*prior AND the padded-state mask (neg) host-side;
    # bias_t is the same with prior_beta == 1 for the un-annealed channel
    bias = ex[:, 0:1]                    # (s_block, 1)

    # bf16 multiply, f32 accumulate — identical to jnp.dot's DEFAULT TPU
    # precision in the XLA scan (round-1 note: default matmul already
    # multiplies in bf16).  Keeping the operands f32 forced Mosaic into the
    # multi-pass full-f32 MXU path, ~6x the passes — measured 1.45 ms of the
    # 2.8 ms/chunk kernel time at S=12,564.
    lik = jnp.dot(cat, pg, preferred_element_type=f32)  # inv2s2 pre-folded
    logits = beta * lik + bias

    misc = misc_ref[:]
    m_old = misc[0:1, :]
    l_old = misc[1:2, :]
    mt_old = misc[2:3, :]
    lt_old = misc[3:4, :]

    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    r = expfn(m_old - m_new)                          # (1, Ct)
    p = expfn(logits - m_new)                         # (s_block, Ct)
    l_new = l_old * r + jnp.sum(p, axis=0, keepdims=True)

    dn = (((0,), (0,)), ((), ()))        # contract the s_block (sublane) dim
    acc_ref[:] = acc_ref[:] * r + jax.lax.dot_general(
        mom, p.astype(mom.dtype), dn,
        preferred_element_type=f32)                   # (Mtot, Ct)

    # un-annealed (true) channel: max/mass only; statically dropped in the
    # saturated steady state (beta == prior_beta == 1 -> F_true == F) where
    # its exp is half the kernel's VPU work
    if collect_true:
        logits_t = lik + ex[:, 1:2]
        mt_new = jnp.maximum(mt_old,
                             jnp.max(logits_t, axis=0, keepdims=True))
        lt_new = (lt_old * expfn(mt_old - mt_new)
                  + jnp.sum(expfn(logits_t - mt_new), axis=0,
                            keepdims=True))
    else:
        mt_new, lt_new = mt_old, lt_old

    misc_ref[:] = jnp.concatenate(
        [m_new, l_new, mt_new, lt_new, misc[4:, :]], axis=0)


def bigs_multi_pallas(proj: jnp.ndarray, Gf: jnp.ndarray,
                      states_p: jnp.ndarray, outer_p: jnp.ndarray,
                      vcounts_p: jnp.ndarray, prior: jnp.ndarray,
                      valid: jnp.ndarray, absst_p: jnp.ndarray,
                      inv2s2, beta, prior_beta, s_block: int,
                      tile: int = 512, interpret: bool = False,
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
    # fused lik operand: lik = dot([2*st | -ot], [projT ; GfT]) — one
    # contraction-(Hp+Hp^2) MXU pass instead of two near-empty ones.
    # inv2s2 folds into pg host-side; operands cast to bf16 so Mosaic
    # emits the single-pass bf16-multiply/f32-accumulate MXU form — the
    # same semantics jnp.dot uses at default TPU precision in the XLA
    # scan (f32 operands forced the ~6x multi-pass full-f32 path,
    # measured 1.45 ms of the 2.8 ms/chunk kernel time).
    pg = jnp.concatenate([jnp.pad(proj, ((0, pad), (0, 0))).T,
                          jnp.pad(Gf, ((0, pad), (0, 0))).T], axis=0)
    pg = (pg * jnp.asarray(inv2s2, f32)).astype(bf16)
    Cp = C + pad
    n_dp = Cp // tile
    n_s = S_loc // s_block

    st = states_p.astype(f32)
    ot = outer_p.astype(f32)
    # state entries and their products are small integers — exact in bf16
    cat = jnp.concatenate([2.0 * st, -ot], axis=1).astype(bf16)
    # fused moment operand: one (s_block, Mtot) GEMM accumulates
    # <s>, <ss^T>, value counts and |s| together; rows pad to a multiple
    # of 16 (bf16 sublane tile) with zeros — they accumulate zeros
    mom = jnp.concatenate(
        [st, ot, vcounts_p.astype(f32), absst_p.astype(f32)[:, None]], axis=1)
    Mraw = Hp + Hp2 + K + 1
    Mtot = -(-Mraw // 16) * 16
    mom = jnp.pad(mom, ((0, 0), (0, Mtot - Mraw))).astype(bf16)

    # the annealed/un-annealed prior terms AND the padded-state mask fold
    # into two per-state f32 bias columns (one broadcast add per element
    # in the kernel instead of mul + add + where)
    bias = jnp.where(valid > 0, jnp.asarray(prior_beta, f32) * prior, neg)
    bias_t = jnp.where(valid > 0, prior, neg)
    ex = jnp.stack([bias, bias_t], axis=1).astype(f32)        # (S_loc, 2)
    scal = jnp.stack([jnp.asarray(inv2s2, f32), jnp.asarray(beta, f32),
                      jnp.asarray(prior_beta, f32)])[None, :]

    kernel = partial(_kernel, s_block=s_block, Ct=tile, Mtot=Mtot,
                     collect_true=collect_true,
                     expfn=_resolve_exp_impl(exp_impl))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_dp, n_s),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp + Hp2, tile), lambda i, j: (0, i)),  # pg
            pl.BlockSpec((s_block, Hp + Hp2), lambda i, j: (j, 0)),  # cat
            pl.BlockSpec((s_block, Mtot), lambda i, j: (j, 0)),   # mom
            pl.BlockSpec((s_block, 2), lambda i, j: (j, 0)),      # extras
        ],
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
    )(scal, pg, cat, mom, ex)

    a_s = acc[0:Hp, :C].T
    a_ss = acc[Hp:Hp + Hp2, :C].T
    a_vc = acc[Hp + Hp2:Hp + Hp2 + K, :C].T
    a_abs = acc[Hp + Hp2 + K, :C]
    return (misc[0, :C], misc[1, :C], misc[2, :C], misc[3, :C],
            a_abs, a_s, a_ss, a_vc)
