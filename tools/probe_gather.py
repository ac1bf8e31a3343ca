"""Probe which gather formulations Mosaic compiles on this chip (round 2).

Candidates to replace the one-hot gather GEMMs in ops/linear_pallas.py:
  A. jnp.take(table, idx_1d, axis=0)         sublane row gather
  B. jnp.take_along_axis(P, idx2d, axis=1)   lane gather
  C. one-hot GEMM (current baseline — always works)

Each probe compiles a tiny kernel, checks numerics vs XLA, and times it.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Ct, H, D, Hp = 256, 304, 256, 8
N_TILES = 16
rng = np.random.default_rng(0)
tab_np = rng.standard_normal((H, D)).astype(np.float32)
idx_np = rng.integers(0, H, size=(Ct * N_TILES,)).astype(np.int32)
P_np = rng.standard_normal((Ct * N_TILES, H)).astype(np.float32)
idx2_np = rng.integers(0, H, size=(Ct * N_TILES, Hp)).astype(np.int32)


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe(name, builder):
    try:
        fn, args, check = builder()
        out = np.asarray(fn(*args))
        ok = check(out)
        dt = timeit(fn, *args)
        print(f"[{name}] OK match={ok} {dt*1e6:.1f} us", flush=True)
    except Exception as e:
        msg = repr(e)[:300].replace("\n", " ")
        print(f"[{name}] FAIL {msg}", flush=True)


# ---- A: row gather via jnp.take ---------------------------------------------
def build_take_rows():
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]                       # (Ct,) i32 in VMEM? try 1-D
        out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Ct,), lambda i: (i,)),
                  pl.BlockSpec((H, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((Ct, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ct * N_TILES, D), jnp.float32),
    )
    fj = jax.jit(f)
    args = (jnp.asarray(idx_np), jnp.asarray(tab_np))
    ref = tab_np[idx_np]
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


# ---- A2: row gather, 2-D idx (Ct,1) + explicit dynamic_gather path ----------
def build_take_rows_2d():
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:, 0]                    # (Ct,)
        out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Ct, 1), lambda i: (i, 0)),
                  pl.BlockSpec((H, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((Ct, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ct * N_TILES, D), jnp.float32),
    )
    fj = jax.jit(f)
    args = (jnp.asarray(idx_np)[:, None], jnp.asarray(tab_np))
    ref = tab_np[idx_np]
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


# ---- B: lane gather via take_along_axis -------------------------------------
def build_lane_gather():
    def kernel(P_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(P_ref[:], idx_ref[:], axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Ct, H), lambda i: (i, 0)),
                  pl.BlockSpec((Ct, Hp), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((Ct, Hp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ct * N_TILES, Hp), jnp.float32),
    )
    fj = jax.jit(f)
    args = (jnp.asarray(P_np), jnp.asarray(idx2_np))
    ref = np.take_along_axis(P_np, idx2_np, axis=1)
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


# ---- C: one-hot GEMM baseline ----------------------------------------------
def build_onehot_gemm():
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]                       # (Ct, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (Ct, H), 1)
        hot = (col == idx).astype(jnp.float32)
        out_ref[:] = jnp.dot(hot, tab_ref[:],
                             preferred_element_type=jnp.float32)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Ct, 1), lambda i: (i, 0)),
                  pl.BlockSpec((H, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((Ct, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ct * N_TILES, D), jnp.float32),
    )
    fj = jax.jit(f)
    args = (jnp.asarray(idx_np)[:, None], jnp.asarray(tab_np))
    ref = tab_np[idx_np]
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


# ---- D: shape-matched sublane gather: out[i,j] = tab[idxb[i,j], j] ----------
def build_shapematched_rows():
    def kernel(idx_ref, tab_ref, out_ref):
        idxb = jnp.broadcast_to(idx_ref[:], (H, D)).astype(jnp.int32)
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idxb, axis=0)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((H, 1), lambda i: (i, 0)),
                  pl.BlockSpec((H, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((H, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H * N_TILES, D), jnp.float32),
    )
    fj = jax.jit(f)
    idxH = rng.integers(0, H, size=(H * N_TILES,)).astype(np.int32)
    args = (jnp.asarray(idxH)[:, None], jnp.asarray(tab_np))
    ref = tab_np[idxH]
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


# ---- E: shape-matched lane gather: out[i,j] = P[i, idxf[i,j]] ---------------
def build_shapematched_lanes():
    idxf_np = rng.integers(0, H, size=(Ct * N_TILES, H)).astype(np.int32)

    def kernel(P_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(P_ref[:], idx_ref[:], axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Ct, H), lambda i: (i, 0)),
                  pl.BlockSpec((Ct, H), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((Ct, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Ct * N_TILES, H), jnp.float32),
    )
    fj = jax.jit(f)
    args = (jnp.asarray(P_np), jnp.asarray(idxf_np))
    ref = np.take_along_axis(P_np, idxf_np, axis=1)
    return fj, args, lambda out: np.allclose(out, ref, atol=1e-6)


builders_extra = {"D": build_shapematched_rows, "E": build_shapematched_lanes}


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1:] or ["D", "E", "C"]
    builders = {"A": build_take_rows, "A2": build_take_rows_2d,
                "B": build_lane_gather, "C": build_onehot_gemm,
                **builders_extra}
    for w in which:
        probe(w, builders[w])
