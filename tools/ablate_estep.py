"""Ablation-profile the fused linear E-step Pallas kernel on chip (round 2).

Times kernel variants with individual cost centers knocked out, to locate
the bottleneck before rewriting (VERDICT r1 item #2).  Variants produce
WRONG numerics by design — timing only.

Cost centers (per datapoint, patches config D=256 H=304 Hp=8 S=154):
  P GEMM        y@W                      78k MACs   (necessary)
  select        8x iterated argmax       ~15k VPU
  T GEMMs       hots[a]@gram (8x HxH)    739k MACs  (gather family)
  Gf loop       64x mul+rowsum (Ct,H)    ~39k VPU
  logits+smax   small GEMMs + exp        ~15k mixed
  ss scatter    8x (H,Ct)@(Ct,H) + T2a   739k MACs + ~19k VPU
  xs GEMM       y.T@sw                   78k MACs   (necessary)

Run: timeout 1100 python tools/ablate_estep.py [variant ...]
"""
import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from prosper_tpu.core.states import binary_state_space  # noqa: E402
from prosper_tpu.core.etstep import state_arrays_from   # noqa: E402

D, H, Hp, GAMMA = 256, 304, 8, 4
N = 131072
TILE = int(os.environ.get("ABL_TILE", "256"))   # 512 probes VMEM headroom
ITERS = 10


def kernel(scal_ref, y_ref, w_ref, W_ref, gram_ref, gdiag_ref,
           states_ref, outer_ref, absst_ref,
           F_ref, xs_ref, ss_ref, s_ref,
           *, Ct, S, mode):
    i = pl.program_id(0)
    f32 = jnp.float32
    sigma2 = scal_ref[0, 0]
    inv2s2 = 0.5 / sigma2
    log_odd = scal_ref[0, 1]

    y = y_ref[:]
    w2 = w_ref[:]
    W = W_ref[:]
    gram = gram_ref[:]
    gdiag = gdiag_ref[:]
    states = states_ref[:]
    outer = outer_ref[:]
    absst = absst_ref[:]

    P = jnp.dot(y, W, preferred_element_type=f32)          # (Ct, H)

    # contract dim-0 x dim-0 without materializing a transpose (Mosaic
    # lowers explicit .T as a real VMEM transpose; the MXU loads the
    # stationary operand transposed natively, so dot_general is free)
    dg0 = lambda A, B: jax.lax.dot_general(
        A, B, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    col = jax.lax.broadcasted_iota(jnp.int32, (Ct, H), 1)
    if mode == "no_sel":
        # static striped one-hots: no argmax chain
        hots = [(col % Hp == a).astype(f32) * (col < Hp).astype(f32) +
                (col == a).astype(f32) * 0.0 for a in range(Hp)]
        hots = [(col == a).astype(f32) for a in range(Hp)]
    elif mode == "selfast":
        # timing ceiling: drop the first-index tie-break (WRONG on exact
        # ties) — measures what the 8-pass argmax costs beyond max+mask
        w_norm = jnp.sqrt(jnp.maximum(gdiag, 1e-30))
        s_work = P / w_norm
        hots = []
        for _ in range(Hp):
            mx = jnp.max(s_work, axis=1, keepdims=True)
            hot = (s_work == mx)
            hots.append(hot.astype(f32))
            s_work = jnp.where(hot, -jnp.inf, s_work)
    else:
        w_norm = jnp.sqrt(jnp.maximum(gdiag, 1e-30))
        score = P / w_norm
        hots = []
        s_work = score
        for _ in range(Hp):
            mx = jnp.max(s_work, axis=1, keepdims=True)
            first = (s_work == mx)
            idx = jnp.min(jnp.where(first, col, H), axis=1, keepdims=True)
            hot = (col == idx)
            hots.append(hot.astype(f32))
            s_work = jnp.where(hot, -jnp.inf, s_work)

    proj_cols = [jnp.sum(hots[a] * P, axis=1, keepdims=True)
                 for a in range(Hp)]
    proj = jnp.concatenate(proj_cols, axis=1)              # (Ct, Hp)

    if mode == "no_gf":
        Gf = jnp.broadcast_to(proj, (Ct, Hp)) @ jnp.ones((Hp, Hp * Hp), f32)
    elif mode == "no_gf_gemm":
        # keep the 64-term VPU loop but feed it P instead of T GEMM outputs
        G_cols = []
        for a in range(Hp):
            for b in range(Hp):
                G_cols.append(jnp.sum(P * hots[b], axis=1, keepdims=True))
        Gf = jnp.concatenate(G_cols, axis=1)
    elif mode == "gf_gemm_only":
        # keep the 8 T GEMMs, skip the 64-term pairing loop
        T = [jnp.dot(hots[a], gram, preferred_element_type=f32)
             for a in range(Hp)]
        acc = T[0]
        for a in range(1, Hp):
            acc = acc + T[a]
        Gf = jnp.broadcast_to(jnp.sum(acc, axis=1, keepdims=True),
                              (Ct, Hp * Hp))
    elif mode == "t_bf16":
        # one-pass bf16 gather GEMMs (hot is exact in bf16; gram rounded —
        # timing probe only)
        bf = jnp.bfloat16
        T = [jnp.dot(hots[a].astype(bf), gram.astype(bf),
                     preferred_element_type=f32) for a in range(Hp)]
        G_cols = []
        for a in range(Hp):
            for b in range(Hp):
                G_cols.append(jnp.sum(T[a] * hots[b], axis=1, keepdims=True))
        Gf = jnp.concatenate(G_cols, axis=1)
    elif mode in ("t_stacked", "stacked"):
        # ONE (Hp*Ct, H) @ (H, H) GEMM instead of Hp separate gather GEMMs
        hcat = jnp.concatenate(hots, axis=0)
        Tcat = jnp.dot(hcat, gram, preferred_element_type=f32)
        T = [Tcat[a * Ct:(a + 1) * Ct] for a in range(Hp)]
        G_cols = []
        for a in range(Hp):
            for b in range(Hp):
                G_cols.append(jnp.sum(T[a] * hots[b], axis=1, keepdims=True))
        Gf = jnp.concatenate(G_cols, axis=1)
    elif mode == "t_split":
        # exact-to-~f32 split: gram = hi + lo in bf16, 2 one-pass GEMMs
        bf = jnp.bfloat16
        g_hi = gram.astype(bf)
        g_lo = (gram - g_hi.astype(f32)).astype(bf)
        T = [(jnp.dot(hots[a].astype(bf), g_hi, preferred_element_type=f32)
              + jnp.dot(hots[a].astype(bf), g_lo, preferred_element_type=f32))
             for a in range(Hp)]
        G_cols = []
        for a in range(Hp):
            for b in range(Hp):
                G_cols.append(jnp.sum(T[a] * hots[b], axis=1, keepdims=True))
        Gf = jnp.concatenate(G_cols, axis=1)
    else:
        T = [jnp.dot(hots[a], gram, preferred_element_type=f32)
             for a in range(Hp)]
        G_cols = []
        for a in range(Hp):
            for b in range(Hp):
                G_cols.append(jnp.sum(T[a] * hots[b], axis=1, keepdims=True))
        Gf = jnp.concatenate(G_cols, axis=1)

    lik_multi = (2.0 * jnp.dot(proj, states.T, preferred_element_type=f32)
                 - jnp.dot(Gf, outer.T, preferred_element_type=f32)) * inv2s2
    lik_single = (2.0 * P - gdiag) * inv2s2
    logits_multi = lik_multi + absst * log_odd
    logits_single = lik_single + log_odd

    m = jnp.maximum(jnp.max(logits_multi, axis=1, keepdims=True), 0.0)
    m = jnp.maximum(m, jnp.max(logits_single, axis=1, keepdims=True))
    pm = jnp.exp(logits_multi - m)
    ps = jnp.exp(logits_single - m)
    Z = jnp.exp(-m) + jnp.sum(pm, axis=1, keepdims=True) \
        + jnp.sum(ps, axis=1, keepdims=True)
    qm = pm / Z
    qs = ps / Z
    F = m + jnp.log(Z)
    F_ref[:] = F

    s_cand = jnp.dot(qm, states, preferred_element_type=f32)
    ss_cand = jnp.dot(qm, outer, preferred_element_type=f32)

    s_full = qs
    for a in range(Hp):
        s_full = s_full + hots[a] * s_cand[:, a][:, None]
    sw = s_full * w2
    if mode in ("dg", "selfast", "dg_noss"):
        tile_xs = dg0(y, sw)
    else:
        tile_xs = jnp.dot(y.T, sw, preferred_element_type=f32)
    tile_s = jnp.sum(sw, axis=0, keepdims=True)

    if mode in ("no_ss", "dg_noss"):
        tile_ss = jnp.zeros((H, H), f32) + jnp.sum(ss_cand)
    elif mode in ("ss_stacked", "stacked"):
        # ONE (H, Hp*Ct) @ (Hp*Ct, H) GEMM instead of Hp separate GEMMs:
        # exact same terms, K-stacked for MXU pipelining
        T2s = []
        for a in range(Hp):
            T2a = jnp.zeros((Ct, H), f32)
            for b in range(Hp):
                T2a = T2a + ss_cand[:, a * Hp + b][:, None] * hots[b]
            T2s.append(T2a)
        wcat = jnp.concatenate([hots[a] * w2 for a in range(Hp)], axis=0)
        T2cat = jnp.concatenate(T2s, axis=0)
        tile_ss = jnp.dot(wcat.T, T2cat, preferred_element_type=f32)
    elif mode in ("dg", "selfast"):
        tile_ss = jnp.zeros((H, H), f32)
        for a in range(Hp):
            T2a = jnp.zeros((Ct, H), f32)
            for b in range(Hp):
                T2a = T2a + ss_cand[:, a * Hp + b][:, None] * hots[b]
            tile_ss = tile_ss + dg0(hots[a] * w2, T2a)
    else:
        tile_ss = jnp.zeros((H, H), f32)
        for a in range(Hp):
            T2a = jnp.zeros((Ct, H), f32)
            for b in range(Hp):
                T2a = T2a + ss_cand[:, a * Hp + b][:, None] * hots[b]
            tile_ss = tile_ss + jnp.dot((hots[a] * w2).T, T2a,
                                        preferred_element_type=f32)

    @pl.when(i == 0)
    def _():
        xs_ref[:] = tile_xs
        ss_ref[:] = tile_ss
        s_ref[:] = tile_s

    @pl.when(i > 0)
    def _():
        xs_ref[:] = xs_ref[:] + tile_xs
        ss_ref[:] = ss_ref[:] + tile_ss
        s_ref[:] = s_ref[:] + tile_s


def build(mode):
    space = binary_state_space(Hp, GAMMA)
    sa = state_arrays_from(space)
    S = int(sa.states.shape[0])
    n_tiles = N // TILE
    k = functools.partial(kernel, Ct=TILE, S=S, mode=mode)
    out_shape = (
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((D, H), jnp.float32),
        jax.ShapeDtypeStruct((H, H), jnp.float32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((H, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((S, Hp), lambda i: (0, 0)),
            pl.BlockSpec((S, Hp * Hp), lambda i: (0, 0)),
            pl.BlockSpec((1, S), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((D, H), lambda i: (0, 0)),
            pl.BlockSpec((H, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
    )
    f = pl.pallas_call(k, grid_spec=grid_spec, out_shape=out_shape)
    return jax.jit(f), sa


def main():
    variants = sys.argv[1:] or ["full", "stacked", "no_ss", "no_sel",
                                "no_gf", "no_gf_gemm"]
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((D, H)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    w = jnp.ones((N, 1), jnp.float32)
    gram = W.T @ W
    gdiag = jnp.diagonal(gram)[None, :]
    scal = jnp.asarray([[1.0, -4.0]], jnp.float32)
    print("devices:", jax.devices(), flush=True)

    results = {}
    for mode in variants:
        f, sa = build(mode)
        rest = (y, w, W, gram, gdiag, sa.states, sa.outer,
                sa.abs_states[None, :])

        # honest timing: on-device fori_loop with a loop-carried dependence
        # (block_until_ready does not reliably fence pallas work through the
        # axon relay; one scalar fetch costs ~40 ms — amortize over ITERS)
        def loop(s, _rest=rest, _f=f):
            def body(_, carry):
                out = _f(carry, *_rest)
                return carry + 1e-30 * out[0][0, 0]
            return jax.lax.fori_loop(0, ITERS, body, s)

        g = jax.jit(loop)
        try:
            t0 = time.perf_counter()
            _ = float(np.asarray(g(scal))[0, 0])
            tc = time.perf_counter() - t0
            best = 1e30
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(np.asarray(g(scal))[0, 0])
                best = min(best, (time.perf_counter() - t0) / ITERS)
            results[mode] = best
            print(f"[{mode}] {best*1e3:.3f} ms/batch  "
                  f"({N/best/1e6:.2f} M dp/s, compile {tc:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{mode}] FAIL {repr(e)[:200]}", flush=True)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
