"""Fused Pallas TPU kernel for the max-superposition (MCA/MMCA) ET E-step.

Reference behavior: SURVEY.md §2 rows "MCA-ET"/"MMCA-ET" — the same
truncated-union E-step as core/maxstep.py, fused into one VMEM-resident
kernel per datapoint tile.

Why a kernel here (ROUND2.md "Max-family DP"): the XLA path is HBM-bound on
the (chunk, S, D) winner lattice — throughput is chunk-size-insensitive and
~2x below the linear family.  Here the lattice lives entirely in VMEM as an
(S, D, Ct) tensor: the winner max, the likelihood reductions, and the
hard-responsibility masks never touch HBM.  MMCA's extra |W| key tensor
(the round-2 "unexplained 17% MCA-vs-MMCA gap" — for MCA key == value, so
XLA CSEs the two (C,S,D) tensors into one; MMCA materialises both and pays
~2x the lattice HBM traffic) also stays on-chip, closing that gap.

Orientation note: every per-datapoint tensor is TRANSPOSED (datapoint dim
LAST, e.g. PT is (H, Ct)) so the datapoint tile size Ct — a free choice,
always a multiple of 128 — is the lane dimension, and small model dims
(D, H, S) sit on sublanes where padding is 8x cheaper.  The caller feeds
yT/W/WT pre-transposed; outputs numerT/denomT are (D, H).

Hard-winner (rho <= 0) path only: the annealed softened-max branch
(sched['rho'] > 0) needs Hp extra (S, D, Ct) power tensors per tile and is
served by the XLA path via lax.cond in models/mca.py — rho schedules are a
short annealing window, so the hot steady state is the hard path.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prosper_tpu.core.etstep import LinearStateArrays


def _kernel(scal_ref, yT_ref, w_ref, W_ref, WT_ref, gdiagT_ref,
            states_ref, statesT_ref, absst_ref,
            F_ref, numerT_ref, denomT_ref, sT_ref, misc_ref,
            *, Ct: int, D: int, H: int, Hp: int, S: int, magnitude: bool,
            collect_true: bool):
    i = pl.program_id(0)
    f32 = jnp.float32
    neg = jnp.float32(-3e38)

    sigma2 = scal_ref[0, 0]
    beta = scal_ref[0, 1]
    prior_beta = scal_ref[0, 2]
    log_odds = scal_ref[0, 3]
    inv2s2 = 0.5 / sigma2

    yT = yT_ref[:]                                 # (D, Ct)
    w2 = w_ref[:]                                  # (1, Ct)
    W = W_ref[:]                                   # (D, H)
    WT = WT_ref[:]                                 # (H, D)
    gdiagT = gdiagT_ref[:]                         # (H, 1)
    states = states_ref[:]                         # (S, Hp) 0/1
    statesT = statesT_ref[:]                       # (Hp, S)
    absst = absst_ref[:]                           # (S, 1)

    PT = jnp.dot(WT, yT, preferred_element_type=f32)        # (H, Ct)

    # ---- candidate selection: Hp iterated argmaxes over the SUBLANE axis ---
    w_norm = jnp.sqrt(jnp.maximum(gdiagT, 1e-30))           # (H, 1)
    score = PT / w_norm
    if magnitude:
        score = jnp.abs(score)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, Ct), 0)
    hotsT = []
    s_work = score
    for _ in range(Hp):
        mx = jnp.max(s_work, axis=0, keepdims=True)
        first = (s_work == mx)
        idx = jnp.min(jnp.where(first, row, H), axis=0, keepdims=True)
        hot = (row == idx)
        hotsT.append(hot.astype(f32))                        # (H, Ct)
        s_work = jnp.where(hot, -jnp.inf, s_work)

    # candidate dictionary slabs, datapoint-last: (D, Ct) per slot
    WcT = [jnp.dot(W, hotsT[a], preferred_element_type=f32)
           for a in range(Hp)]
    keyT = [jnp.abs(Wc) for Wc in WcT] if magnitude else WcT

    # ---- winner lattice over all S multi states, entirely in VMEM ----------
    # every multi state has >= 2 active slots, so each (s, d) cell always
    # finds a winner: best stays the slot index, ybar the winning value
    ybar = jnp.full((S, D, Ct), neg, f32)
    key = jnp.full((S, D, Ct), neg, f32)
    best = jnp.full((S, D, Ct), -1.0, f32)
    for h in range(Hp):
        vh = jax.lax.broadcast_in_dim(WcT[h], (S, D, Ct), (1, 2))
        kh = jax.lax.broadcast_in_dim(keyT[h], (S, D, Ct), (1, 2))
        ah = jax.lax.broadcast_in_dim(states[:, h], (S, D, Ct), (0,))
        kh = jnp.where(ah > 0.5, kh, neg)
        better = kh > key
        ybar = jnp.where(better, vh, ybar)
        key = jnp.where(better, kh, key)
        best = jnp.where(better, jnp.float32(h), best)

    y3 = jax.lax.broadcast_in_dim(yT, (S, D, Ct), (1, 2))
    y_dot = jnp.sum(y3 * ybar, axis=1)                       # (S, Ct)
    ybar2 = jnp.sum(ybar * ybar, axis=1)                     # (S, Ct)

    lik_multi = (2.0 * y_dot - ybar2) * inv2s2               # (S, Ct)
    prior_multi = absst * log_odds                           # (S, 1)
    logits_multi = beta * lik_multi + prior_beta * prior_multi
    lik_single = (2.0 * PT - gdiagT) * inv2s2                # (H, Ct)
    logits_single = beta * lik_single + prior_beta * log_odds

    def union_softmax(ls, lm):
        m = jnp.maximum(jnp.max(lm, axis=0, keepdims=True), 0.0)
        m = jnp.maximum(m, jnp.max(ls, axis=0, keepdims=True))  # (1, Ct)
        ps = jnp.exp(ls - m)
        pm = jnp.exp(lm - m)
        Z = (jnp.exp(-m) + jnp.sum(pm, axis=0, keepdims=True)
             + jnp.sum(ps, axis=0, keepdims=True))
        return ps / Z, pm / Z, jnp.exp(-m) / Z, m + jnp.log(Z)

    q_single, q_multi, q_zero, logZ = union_softmax(logits_single,
                                                    logits_multi)

    y2 = jnp.sum(yT * yT, axis=0, keepdims=True)             # (1, Ct)
    log_p0 = -jnp.log1p(jnp.exp(log_odds))
    log_norm = 0.5 * D * jnp.log(2.0 * jnp.pi * sigma2)
    F = logZ - beta * (y2 * inv2s2) - beta * log_norm \
        + prior_beta * H * log_p0                            # (1, Ct)
    if collect_true:
        # un-annealed channel: a second union softmax over the (S, Ct)
        # lattice — statically dropped when saturated (F_true == F)
        _, _, _, logZ_t = union_softmax(lik_single + log_odds,
                                        lik_multi + prior_multi)
        F_true = logZ_t - y2 * inv2s2 - log_norm + H * log_p0
    else:
        F_true = F
    F_ref[:] = F

    # ---- <s> and activity ---------------------------------------------------
    s_cand = jnp.dot(statesT, q_multi, preferred_element_type=f32)  # (Hp, Ct)
    s_fullT = q_single                                              # (H, Ct)
    for a in range(Hp):
        s_fullT = s_fullT + hotsT[a] * s_cand[a, :][None, :]
    sw = s_fullT * w2
    tile_s = jnp.sum(sw, axis=1, keepdims=True)                     # (H, 1)
    abs_n = (jnp.sum(q_single, axis=0, keepdims=True)
             + jnp.dot(absst.T, q_multi, preferred_element_type=f32))  # (1,Ct)

    # ---- hard winner responsibilities + the W M-step statistics ------------
    #   A_h[d, c] = sum_s qa[s, c] [best[s, d, c] == h]     (D, Ct)
    #   denomT   += A_h @ hots_h^T  (contract over Ct)      (D, H)
    #   numerT   += (A_h * yT) @ hots_h^T
    qa = q_multi * w2                                               # (S, Ct)
    q3 = jax.lax.broadcast_in_dim(qa, (S, D, Ct), (0, 2))
    dn = (((1,), (1,)), ((), ()))        # contract lane dim with lane dim
    tile_numer = jnp.zeros((D, H), f32)
    tile_denom = jnp.zeros((D, H), f32)
    for h in range(Hp):
        mask = (best == jnp.float32(h)).astype(f32)
        A_h = jnp.sum(q3 * mask, axis=0)                            # (D, Ct)
        tile_denom = tile_denom + jax.lax.dot_general(
            A_h, hotsT[h], dn, preferred_element_type=f32)
        tile_numer = tile_numer + jax.lax.dot_general(
            A_h * yT, hotsT[h], dn, preferred_element_type=f32)
    qsw = q_single * w2                                             # (H, Ct)
    tile_denom = tile_denom + jnp.sum(qsw, axis=1, keepdims=True).T
    tile_numer = tile_numer + jax.lax.dot_general(
        yT, qsw, dn, preferred_element_type=f32)

    # ---- noise residual -----------------------------------------------------
    resid_multi = jnp.sum(q_multi * (y2 - 2.0 * y_dot + ybar2),
                          axis=0, keepdims=True)                    # (1, Ct)
    resid_single = jnp.sum(q_single * (y2 - 2.0 * PT + gdiagT),
                           axis=0, keepdims=True)
    resid = q_zero * y2 + resid_single + resid_multi

    def lanesum(x):                                   # (1, Ct) -> (1, 1)
        return jnp.sum(x, axis=1, keepdims=True)

    misc = jnp.concatenate(
        [lanesum(abs_n * w2), lanesum(resid * w2), lanesum(y2 * w2),
         lanesum(w2), lanesum(F * w2), lanesum(F_true * w2)],
        axis=1)                                                     # (1, 6)

    @pl.when(i == 0)
    def _():
        numerT_ref[:] = tile_numer
        denomT_ref[:] = tile_denom
        sT_ref[:] = tile_s
        misc_ref[:] = misc

    @pl.when(i > 0)
    def _():
        numerT_ref[:] = numerT_ref[:] + tile_numer
        denomT_ref[:] = denomT_ref[:] + tile_denom
        sT_ref[:] = sT_ref[:] + tile_s
        misc_ref[:] = misc_ref[:] + misc


def _dtiled_kernel(scal_ref, PT_ref, yT_ref, w_ref, Wblk_ref, gdiagT_ref,
                   statesT_ref, absst_ref,
                   F_ref, numerT_ref, denomT_ref, sT_ref, misc_ref,
                   hots_ref, ydot_ref, ybar2_ref, y2_ref, qw_ref, qsw_ref,
                   *, Ct: int, Dt: int, n_d: int, D_true: int, H: int,
                   Hp: int, S: int, plan, supports, magnitude: bool,
                   collect_true: bool):
    """Two-phase D-tiled winner kernel (round 4 — the patches-config
    max-family fix, ROUND4.md).

    Grid (n_tiles, 2*n_d); j < n_d is phase 0 (likelihood accumulation),
    j >= n_d phase 1 (responsibilities).  The (S, Dt, Ct) winner lattice
    for ONE D-block lives in VMEM registers (subset-lattice DP unrolled
    over the S multi states — each extends its parent with one slot, one
    compare per state instead of Hp masked passes); per-state (S, Ct)
    likelihood partials accumulate in scratch across D-blocks, the union
    softmax fires once per datapoint tile at the end of phase 0, and
    phase 1 rebuilds each block's lattice to route hard-winner
    responsibilities into the (D, H) M-step accumulators (resident output
    blocks, as in _kernel).  PT = W^T y comes in precomputed (it needs
    full-D rows, which this kernel never holds at once).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    f32 = jnp.float32

    sigma2 = scal_ref[0, 0]
    beta = scal_ref[0, 1]
    prior_beta = scal_ref[0, 2]
    log_odds = scal_ref[0, 3]
    inv2s2 = 0.5 / sigma2

    w2 = w_ref[:]                                   # (1, Ct)
    Wblk = Wblk_ref[:]                              # (Dt, H)
    yT = yT_ref[:]                                  # (Dt, Ct)

    # ---- once per datapoint tile: candidate selection into scratch ---------
    @pl.when(j == 0)
    def _():
        PT = PT_ref[:]                              # (H, Ct)
        gdiagT = gdiagT_ref[:]                      # (H, 1)
        w_norm = jnp.sqrt(jnp.maximum(gdiagT, 1e-30))
        score = PT / w_norm
        if magnitude:
            score = jnp.abs(score)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, Ct), 0)
        s_work = score
        for a in range(Hp):
            mx = jnp.max(s_work, axis=0, keepdims=True)
            first = (s_work == mx)
            idx = jnp.min(jnp.where(first, row, H), axis=0, keepdims=True)
            hot = (row == idx)
            hots_ref[a * H:(a + 1) * H, :] = hot.astype(f32)
            s_work = jnp.where(hot, -jnp.inf, s_work)
        ydot_ref[:] = jnp.zeros((S, Ct), f32)
        ybar2_ref[:] = jnp.zeros((S, Ct), f32)
        y2_ref[:] = jnp.zeros((1, Ct), f32)

    hotsT = [hots_ref[a * H:(a + 1) * H, :] for a in range(Hp)]
    WcT = [jnp.dot(Wblk, hotsT[a], preferred_element_type=f32)
           for a in range(Hp)]                      # Hp x (Dt, Ct)
    keyT = [jnp.abs(Wc) for Wc in WcT] if magnitude else WcT

    def dp_lattice():
        """Unrolled subset-lattice DP over this D-block.  Yields, in global
        state order, (ybar_s, key_s, best_s) as (Dt, Ct) arrays."""
        out = []
        prev = []                                   # current level's states
        lvl1_v, lvl1_k = WcT, keyT
        for parent_pos, add_slot in plan:
            cur = []
            first_level = not prev
            for p, a in zip(parent_pos, add_slot):
                if first_level:
                    pv, pk, pb = lvl1_v[p], lvl1_k[p], jnp.float32(p)
                else:
                    pv, pk, pb = prev[p]
                va, ka = lvl1_v[a], lvl1_k[a]
                better = ka > pk
                yb = jnp.where(better, va, pv)
                kb = jnp.where(better, ka, pk)
                bb = jnp.where(better, jnp.float32(a), pb)
                cur.append((yb, kb, bb))
                out.append((yb, kb, bb))
            prev = cur
        return out

    # ---- phase 0: accumulate per-state likelihood partials -----------------
    @pl.when(j < n_d)
    def _():
        lat = dp_lattice()
        ydot_rows = [jnp.sum(yT * yb, axis=0, keepdims=True)
                     for (yb, _, _) in lat]         # S x (1, Ct)
        ybar2_rows = [jnp.sum(yb * yb, axis=0, keepdims=True)
                      for (yb, _, _) in lat]
        ydot_ref[:] = ydot_ref[:] + jnp.concatenate(ydot_rows, axis=0)
        ybar2_ref[:] = ybar2_ref[:] + jnp.concatenate(ybar2_rows, axis=0)
        y2_ref[:] = y2_ref[:] + jnp.sum(yT * yT, axis=0, keepdims=True)

    # ---- phase 0 end: union softmax + F + per-tile scalar stats ------------
    @pl.when(j == n_d - 1)
    def _():
        PT = PT_ref[:]
        gdiagT = gdiagT_ref[:]
        absst = absst_ref[:]                        # (S, 1)
        y2 = y2_ref[:]                              # (1, Ct)
        lik_multi = (2.0 * ydot_ref[:] - ybar2_ref[:]) * inv2s2   # (S, Ct)
        prior_multi = absst * log_odds
        logits_multi = beta * lik_multi + prior_beta * prior_multi
        lik_single = (2.0 * PT - gdiagT) * inv2s2
        logits_single = beta * lik_single + prior_beta * log_odds

        def union_softmax(ls, lm):
            m = jnp.maximum(jnp.max(lm, axis=0, keepdims=True), 0.0)
            m = jnp.maximum(m, jnp.max(ls, axis=0, keepdims=True))
            ps = jnp.exp(ls - m)
            pm = jnp.exp(lm - m)
            Z = (jnp.exp(-m) + jnp.sum(pm, axis=0, keepdims=True)
                 + jnp.sum(ps, axis=0, keepdims=True))
            return ps / Z, pm / Z, jnp.exp(-m) / Z, m + jnp.log(Z)

        q_single, q_multi, q_zero, logZ = union_softmax(logits_single,
                                                        logits_multi)
        log_p0 = -jnp.log1p(jnp.exp(log_odds))
        log_norm = 0.5 * D_true * jnp.log(2.0 * jnp.pi * sigma2)
        F = logZ - beta * (y2 * inv2s2) - beta * log_norm \
            + prior_beta * H * log_p0
        if collect_true:
            _, _, _, logZ_t = union_softmax(lik_single + log_odds,
                                            lik_multi + prior_multi)
            F_true = logZ_t - y2 * inv2s2 - log_norm + H * log_p0
        else:
            F_true = F
        F_ref[:] = F

        qw_ref[:] = q_multi * w2
        qsw_ref[:] = q_single * w2

        statesT = statesT_ref[:]                    # (Hp, S)
        s_cand = jnp.dot(statesT, q_multi, preferred_element_type=f32)
        s_fullT = q_single
        for a in range(Hp):
            s_fullT = s_fullT + hotsT[a] * s_cand[a, :][None, :]
        tile_s = jnp.sum(s_fullT * w2, axis=1, keepdims=True)     # (H, 1)

        abs_n = (jnp.sum(q_single, axis=0, keepdims=True)
                 + jnp.dot(absst.T, q_multi, preferred_element_type=f32))
        resid_multi = jnp.sum(
            q_multi * (y2 - 2.0 * ydot_ref[:] + ybar2_ref[:]),
            axis=0, keepdims=True)
        resid_single = jnp.sum(q_single * (y2 - 2.0 * PT + gdiagT),
                               axis=0, keepdims=True)
        resid = q_zero * y2 + resid_single + resid_multi

        def lanesum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        misc = jnp.concatenate(
            [lanesum(abs_n * w2), lanesum(resid * w2), lanesum(y2 * w2),
             lanesum(w2), lanesum(F * w2), lanesum(F_true * w2)],
            axis=1)                                               # (1, 6)

        @pl.when(i == 0)
        def _():
            sT_ref[:] = tile_s
            misc_ref[:] = misc

        @pl.when(i > 0)
        def _():
            sT_ref[:] = sT_ref[:] + tile_s
            misc_ref[:] = misc_ref[:] + misc

    # ---- phase 1: rebuild this block's lattice, route responsibilities -----
    @pl.when(j >= n_d)
    def _():
        lat = dp_lattice()
        qw = qw_ref[:]                                            # (S, Ct)
        A = [jnp.zeros((Dt, Ct), f32) for _ in range(Hp)]
        for s, (_, _, bb) in enumerate(lat):
            qrow = qw[s, :][None, :]                              # (1, Ct)
            for a in supports[s]:
                A[a] = A[a] + qrow * (bb == jnp.float32(a))
        qsw = qsw_ref[:]                                          # (H, Ct)
        dn = (((1,), (1,)), ((), ()))      # contract the lane (Ct) dim
        blk_denom = jnp.sum(qsw, axis=1, keepdims=True).T         # (1, H)
        blk_denom = jnp.broadcast_to(blk_denom, (Dt, H))
        blk_numer = jax.lax.dot_general(yT, qsw, dn,
                                        preferred_element_type=f32)
        for a in range(Hp):
            blk_denom = blk_denom + jax.lax.dot_general(
                A[a], hotsT[a], dn, preferred_element_type=f32)
            blk_numer = blk_numer + jax.lax.dot_general(
                A[a] * yT, hotsT[a], dn, preferred_element_type=f32)

        db = (j - n_d) * Dt
        @pl.when(i == 0)
        def _():
            numerT_ref[pl.ds(db, Dt), :] = blk_numer
            denomT_ref[pl.ds(db, Dt), :] = blk_denom

        @pl.when(i > 0)
        def _():
            numerT_ref[pl.ds(db, Dt), :] = (numerT_ref[pl.ds(db, Dt), :]
                                            + blk_numer)
            denomT_ref[pl.ds(db, Dt), :] = (denomT_ref[pl.ds(db, Dt), :]
                                            + blk_denom)


def max_dtiled_tiles(D: int, H: int, Hp: int, S: int, level_max: int,
                     vmem_budget: int = 12 * 1024 * 1024):
    """(Ct, Dt) for the D-tiled kernel, or None when nothing fits.

    Live VMEM ~= lane-scratch (hots Hp*H + 3S + q-space S + H + small) * Ct
    + DP registers (~(2*level_max + 3*Hp + Hp A-accs) * Dt * Ct * 3 arrays)
    + W block Dt*H + PT H*Ct + resident (D, H) outputs * 2."""
    resident = 2 * 4 * D * H
    # preference order measured on chip (tools/bench_max_dtiled.py, patches
    # config): (128, 64) 5.27 M dp/s > (256/512, 32) ~4.9 > (512, 16) 3.8 —
    # bigger D-blocks beat bigger lane tiles (fewer grid phases, better DP
    # locality).  Dt=128 and Ct=1024 variants crashed the remote-compile
    # helper (VMEM edge), so the search stays below them.
    for Ct, Dt in ((128, 64), (256, 64), (256, 32), (512, 32), (512, 16),
                   (256, 16), (128, 32), (128, 16)):
        lanes = 4 * Ct * (Hp * H + 4 * S + 2 * H + 8)
        dp = 4 * Dt * Ct * (3 * (2 * level_max) + 3 * Hp + Hp)
        wblk = 4 * Dt * H + 4 * H * Ct
        if resident + lanes + dp + wblk <= vmem_budget:
            return Ct, Dt
    return None


def max_et_estep_pallas_dtiled(
        y: jnp.ndarray, weight: jnp.ndarray, W: jnp.ndarray, sigma2,
        log_odds_scalar, sa: LinearStateArrays, Hp: int, magnitude: bool,
        beta, prior_beta, tile: int = 0, d_block: int = 0,
        interpret: bool = False,
        collect_true: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """D-tiled fused max-family E-step (hard winner, single device).

    Same contract as max_et_estep_pallas; use when the (S, D)-per-lane
    lattice exceeds VMEM (max_auto_tile == 0 — e.g. the patches config
    D=256, where the XLA path is HBM-bound on the (C, S, D) tile at
    ~1.5 M dp/s)."""
    import numpy as _np
    from prosper_tpu.core.maxstep import _subset_dp_plan

    N, D = y.shape
    H = W.shape[1]
    S = sa.states.shape[0]
    states_np = _np.asarray(sa.states)
    plan = [(list(map(int, pp)), list(map(int, aa)))
            for pp, aa in _subset_dp_plan(states_np)]
    supports = [tuple(int(h) for h in _np.flatnonzero(states_np[s] > 0.5))
                for s in range(S)]
    level_max = max(len(pp) for pp, _ in plan)

    if tile <= 0 or d_block <= 0:
        sized = max_dtiled_tiles(D, H, Hp, S, level_max)
        if sized is None:
            raise ValueError(
                f"max dtiled kernel: no (Ct, Dt) fits VMEM at D={D} H={H} "
                f"S={S}; use the XLA path")
        tile, d_block = sized

    pad = (-N) % tile
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, D), y.dtype)], axis=0)
        weight = jnp.concatenate(
            [weight, jnp.zeros((pad,), weight.dtype)], axis=0)
    n_tiles = (N + pad) // tile
    dpad = (-D) % d_block
    W_p = jnp.pad(W, ((0, dpad), (0, 0))) if dpad else W
    yT_p = jnp.pad(y.T, ((0, dpad), (0, 0))) if dpad else y.T
    Dp = D + dpad
    n_d = Dp // d_block

    gram_diag = jnp.sum(W * W, axis=0)
    PT = jnp.dot(W.T, y.T, preferred_element_type=jnp.float32)    # (H, Np)
    scal = jnp.stack([jnp.asarray(sigma2, jnp.float32),
                      jnp.asarray(beta, jnp.float32),
                      jnp.asarray(prior_beta, jnp.float32),
                      jnp.asarray(log_odds_scalar, jnp.float32)])[None, :]

    kernel = partial(_dtiled_kernel, Ct=tile, Dt=d_block, n_d=n_d,
                     D_true=D, H=H, Hp=Hp, S=S, plan=plan,
                     supports=supports, magnitude=magnitude,
                     collect_true=collect_true)
    out_shape = (
        jax.ShapeDtypeStruct((1, N + pad), jnp.float32),      # F
        jax.ShapeDtypeStruct((Dp, H), jnp.float32),           # numerT
        jax.ShapeDtypeStruct((Dp, H), jnp.float32),           # denomT
        jax.ShapeDtypeStruct((H, 1), jnp.float32),            # sT
        jax.ShapeDtypeStruct((1, 6), jnp.float32),            # misc
    )
    states = jnp.asarray(sa.states, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles, 2 * n_d),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, tile), lambda i, j: (0, i)),         # PT
            pl.BlockSpec((d_block, tile),
                         lambda i, j: (j % n_d, i)),              # yT blk
            pl.BlockSpec((1, tile), lambda i, j: (0, i)),         # w
            pl.BlockSpec((d_block, H), lambda i, j: (j % n_d, 0)),  # W blk
            pl.BlockSpec((H, 1), lambda i, j: (0, 0)),            # gdiagT
            pl.BlockSpec((Hp, S), lambda i, j: (0, 0)),           # statesT
            pl.BlockSpec((S, 1), lambda i, j: (0, 0)),            # absst
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i, j: (0, i)),
            pl.BlockSpec((Dp, H), lambda i, j: (0, 0)),
            pl.BlockSpec((Dp, H), lambda i, j: (0, 0)),
            pl.BlockSpec((H, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 6), lambda i, j: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hp * H, tile), jnp.float32),              # hots
            pltpu.VMEM((S, tile), jnp.float32),                   # ydot
            pltpu.VMEM((S, tile), jnp.float32),                   # ybar2
            pltpu.VMEM((1, tile), jnp.float32),                   # y2
            pltpu.VMEM((S, tile), jnp.float32),                   # qw
            pltpu.VMEM((H, tile), jnp.float32),                   # qsw
        ],
    )
    F, numerT, denomT, sT, misc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, PT, yT_p, weight[None, :], W_p, gram_diag[:, None],
      states.T, jnp.asarray(sa.abs_states, jnp.float32)[:, None])

    misc = misc[0]
    sums = dict(
        numer=numerT[:D].T, denom=denomT[:D].T, s=sT[:, 0],
        abs=misc[0], resid=misc[1], y2=misc[2], n=misc[3],
        F=misc[4], F_true=misc[5],
    )
    return F.reshape(-1)[:N], sums


def max_auto_tile(N: int, D: int, H: int, Hp: int, S: int,
                  vmem_budget: int = 10 * 1024 * 1024) -> int:
    """Largest lane-tile (multiple of 128, <= 1024) whose VMEM working set
    fits; 0 when even Ct=128 does not fit (caller falls back to XLA).

    Dominant live buffers: ~4 (S, D, Ct) f32 lattice tensors (ybar, key,
    best + one broadcast temp) plus the (H, Ct) selection slabs."""
    per_lane = 4 * (4 * S * D + (4 + 2 * Hp) * H + 2 * D * Hp + 3 * S + D + 64)
    tile = 1024
    while tile >= 128 and (tile * per_lane > vmem_budget or tile > max(N, 128)):
        tile //= 2
    return tile if tile >= 128 else 0


def max_et_estep_pallas(
        y: jnp.ndarray, weight: jnp.ndarray, W: jnp.ndarray, sigma2,
        log_odds_scalar, sa: LinearStateArrays, Hp: int, magnitude: bool,
        beta, prior_beta, tile: int = 0,
        interpret: bool = False,
        collect_true: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Drop-in fused-kernel replacement for core.maxstep.max_et_estep's
    hard-winner path (rho <= 0, single device).  tile=0 -> auto-size."""
    N, D = y.shape
    H = W.shape[1]
    S = sa.states.shape[0]
    if tile <= 0:
        tile = max_auto_tile(N, D, H, Hp, S)
        if tile <= 0:
            raise ValueError(
                f"max-family lattice (S={S}, D={D}) exceeds VMEM at the "
                "minimum 128-lane tile; use the XLA path")
    pad = (-N) % tile
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, D), y.dtype)], axis=0)
        weight = jnp.concatenate(
            [weight, jnp.zeros((pad,), weight.dtype)], axis=0)
    n_tiles = (N + pad) // tile

    gram_diag = jnp.sum(W * W, axis=0)
    scal = jnp.stack([jnp.asarray(sigma2, jnp.float32),
                      jnp.asarray(beta, jnp.float32),
                      jnp.asarray(prior_beta, jnp.float32),
                      jnp.asarray(log_odds_scalar, jnp.float32)])[None, :]

    kernel = partial(_kernel, Ct=tile, D=D, H=H, Hp=Hp, S=S,
                     magnitude=magnitude, collect_true=collect_true)
    out_shape = (
        jax.ShapeDtypeStruct((1, N + pad), jnp.float32),      # F (dp-last)
        jax.ShapeDtypeStruct((D, H), jnp.float32),            # numerT
        jax.ShapeDtypeStruct((D, H), jnp.float32),            # denomT
        jax.ShapeDtypeStruct((H, 1), jnp.float32),            # sT
        jax.ShapeDtypeStruct((1, 6), jnp.float32),            # misc
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((D, tile), lambda i: (0, i)),        # yT
            pl.BlockSpec((1, tile), lambda i: (0, i)),        # w
            pl.BlockSpec((D, H), lambda i: (0, 0)),           # W
            pl.BlockSpec((H, D), lambda i: (0, 0)),           # WT
            pl.BlockSpec((H, 1), lambda i: (0, 0)),           # gdiagT
            pl.BlockSpec((S, Hp), lambda i: (0, 0)),          # states
            pl.BlockSpec((Hp, S), lambda i: (0, 0)),          # statesT
            pl.BlockSpec((S, 1), lambda i: (0, 0)),           # absst
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((H, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 6), lambda i: (0, 0)),
        ],
    )

    states = jnp.asarray(sa.states, jnp.float32)
    F, numerT, denomT, sT, misc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, y.T, weight[None, :], W, W.T,
      gram_diag[:, None], states, states.T,
      jnp.asarray(sa.abs_states, jnp.float32)[:, None])

    misc = misc[0]
    sums = dict(
        numer=numerT.T, denom=denomT.T, s=sT[:, 0],
        abs=misc[0], resid=misc[1], y2=misc[2], n=misc[3],
        F=misc[4], F_true=misc[5],
    )
    return F.reshape(-1)[:N], sums
