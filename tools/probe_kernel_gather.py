"""In-kernel candidate-gather probe (round 4, VERDICT r3 #3).

The fused linear-family kernel (ops/linear_pallas.py) implements every
candidate gather/scatter as a one-hot MXU GEMM; the raw-FLOPs inflation is
~2*2*Hp*H^2 MACs per datapoint (bench.py::linear_flops_per_dp), i.e. the
H/Hp-fold overhead VERDICT r3 #3 asks to probe.  The untested alternative
is Mosaic's dynamic-gather lowering (jnp.take_along_axis along lanes).

Three standalone micro-kernels at kernel shapes (Ct=512, H=300, Hp=8):

  A. lane gather    out[c, a] = P[c, idx[c, a]]        (take_along_axis)
     -> replaces the proj extraction (currently Hp VPU mask-reduce passes)
  B. row gather     out[c, :] = gram[idx[c], :]        (jnp.take axis=0)
     -> would replace the T = hots @ gram GEMMs (the big raw-FLOPs term);
        per-SUBLANE row selection, which Mosaic may not lower at all
  C. one-hot GEMM baselines of both.

Outcome contract (bucketing-ablation standard): either a wiring plan with
measured wins, or a measured/structural negative written into BASELINE.md.

Run on the live chip:  python tools/probe_kernel_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Ct, H, Hp = 512, 300, 8
REPS = 50


def chain(fn, n_out=1):
    def run(a, b):
        def body(carry, _):
            a_c, acc = carry
            out = fn(a_c, b)
            leaf = jax.tree_util.tree_leaves(out)[0]
            bump = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return (a_c + bump, acc + bump), None
        (_, acc), _ = jax.lax.scan(body, (a, jnp.float32(0.0)), None,
                                   length=REPS)
        return acc
    return jax.jit(run)


def timeit(name, fn, *args, iters=3):
    try:
        g = chain(fn)
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / (iters * REPS)
        print(f"{name:42s} {dt*1e6:9.1f} us/call", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.standard_normal((Ct, H)).astype(np.float32))
    gram = jnp.asarray(rng.standard_normal((H, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, H, (Ct, Hp)).astype(np.int32))
    # one-hot equivalent (built outside; in the real kernel it exists anyway)
    hots = jax.nn.one_hot(idx, H, dtype=jnp.float32, axis=-1)  # (Ct, Hp, H)

    # ---- A: lane gather (take_along_axis) vs mask-reduce --------------------
    def kern_a_dyn(P_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(P_ref[:], idx_ref[:], axis=1)

    def a_dyn(P, idx):
        return pl.pallas_call(
            kern_a_dyn,
            out_shape=jax.ShapeDtypeStruct((Ct, Hp), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(P, idx)

    def kern_a_hot(P_ref, hots_ref, out_ref):
        P = P_ref[:]
        cols = [jnp.sum(hots_ref[a * Ct:(a + 1) * Ct, :] * P, axis=1,
                        keepdims=True) for a in range(Hp)]
        out_ref[:] = jnp.concatenate(cols, axis=1)

    hots_flat = hots.transpose(1, 0, 2).reshape(Hp * Ct, H)

    def a_hot(P, hf):
        return pl.pallas_call(
            kern_a_hot,
            out_shape=jax.ShapeDtypeStruct((Ct, Hp), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(P, hf)

    timeit("A. proj: dynamic take_along_axis", a_dyn, P, idx)
    timeit("A. proj: one-hot mask-reduce (current)", a_hot, P, hots_flat)

    # ---- B: per-sublane ROW gather of gram vs one-hot GEMM ------------------
    idx0 = idx[:, 0]

    def kern_b_dyn(gram_ref, idx_ref, out_ref):
        # out[c, :] = gram[idx[c], :] — per-sublane row selection
        out_ref[:] = jnp.take(gram_ref[:], idx_ref[:, 0], axis=0)

    def b_dyn(gram, idx0):
        return pl.pallas_call(
            kern_b_dyn,
            out_shape=jax.ShapeDtypeStruct((Ct, H), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(gram, idx0[:, None])

    def kern_b_hot(gram_ref, hot_ref, out_ref):
        out_ref[:] = jnp.dot(hot_ref[:], gram_ref[:],
                             preferred_element_type=jnp.float32)

    hot0 = hots[:, 0, :]

    def b_hot(gram, hot0):
        return pl.pallas_call(
            kern_b_hot,
            out_shape=jax.ShapeDtypeStruct((Ct, H), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(gram, hot0)

    timeit("B. gram row: dynamic jnp.take axis=0", b_dyn, gram, idx0)
    timeit("B. gram row: one-hot GEMM (current)", b_hot, gram, hot0)

    # ---- B': lane-gather after transposing the problem ----------------------
    # gramT columns == gram rows; take_along_axis along lanes needs the
    # index to vary along SUBLANES of the (Ct, H) output — i.e. gather
    # gramT (H, H) columns per output row: out[c, l] = gramT[l, idx[c]]
    # has no 2-D take_along_axis form (operand row is l, index row is c).
    # The expressible variant gathers from a (Ct, H) operand only, so the
    # row gather fundamentally needs the one-hot GEMM.  (Documented here;
    # nothing to time.)
    print("B'. transposed lane-gather form: structurally inexpressible "
          "(index varies along a different axis than the operand row) — "
          "see docstring", flush=True)


if __name__ == "__main__":
    main()
