"""Multi-chip scaling model: measured psum payload + analytic projection.

VERDICT r2 #6 / SURVEY §5.8 / BASELINE north star ("scaling efficiency
>= 0.9 to v5e-16"): real multi-chip hardware is unavailable in this
environment, so the closable gap is analytical — attach NUMBERS to the
claim "suff stats are tiny".  This tool:

 1. traces each family's sharded EM step (shard_map over an 8-virtual-
    device CPU mesh — the same path the driver's dryrun compiles) and
    walks the jaxpr, counting the ACTUAL bytes moved by every collective
    (psum/pmax/... ), with scan-body trip counts multiplied in;
 2. combines the per-step payload with the measured single-chip E-step
    throughput (BENCH_r03 numbers) into a ring-all-reduce time model for
    a v5e-16 (4x4 torus) slice and prints the projected efficiency.

Model (How to Scale Your Model, ch. "sharding"; public v5e specs):
  t_comm(B, P)   = n_psum * t_lat + 2 * B * (P-1)/P / BW_ring
  efficiency(P)  = t_comp(N/P) / (t_comp(N/P) + t_comm)
with BW_ring = 45 GB/s per ICI link direction (v5e: 1600 Gbps aggregate
over 4 links; one ring direction per reduce phase), t_lat ~ 10 us per
collective dispatch (conservative: measured XLA collective launch
overheads are 1-10 us on ICI).  The M-step is replicated (identical on
every chip after the psum) and already inside t_comp.

Run: python tools/scaling_model.py      (CPU-only; never dials the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

COLLECTIVES = ("psum", "pmax", "pmin", "all_gather", "reduce_scatter",
               "all_to_all", "ppermute", "allreduce")

#: v5e public specs / scaling-book constants
BW_RING = 45e9          # bytes/s, one ICI link direction
T_LAT = 10e-6           # s, per-collective dispatch overhead (conservative)
PEAK_DPS = {            # measured single-chip E-step dp/s (BENCH r4 capture;
    # every family at the PATCHES-SCALE config — the comparable matrix)
    "bsc": 12.09e6, "tsc": 11.41e6, "dsc": 12.24e6,
    "gsc": 5.22e6, "mca": 6.30e6, "mmca": 6.23e6,
}


def _walk(jaxpr, mult, hits):
    """Collect (prim_name, bytes, mult) for collective eqns, recursing into
    call/control-flow sub-jaxprs with loop trip counts multiplied in."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if any(name.startswith(c) or c in name for c in COLLECTIVES):
            nbytes = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                         for v in eqn.invars if hasattr(v.aval, "shape"))
            hits.append((name, nbytes, mult))
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * int(eqn.params.get("length", 1))
        for pname in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr"):
            sub = eqn.params.get(pname)
            if sub is not None:
                _walk(getattr(sub, "jaxpr", sub), sub_mult, hits)
        for pname in ("branches",):
            brs = eqn.params.get(pname)
            if brs:
                # cond: payload bound = the max branch
                best = []
                for br in brs:
                    h = []
                    _walk(getattr(br, "jaxpr", br), sub_mult, h)
                    if sum(b * m for _, b, m in h) > sum(
                            b * m for _, b, m in best):
                        best = h
                hits.extend(best)


def step_comm_bytes(model, params, N, mesh_shape=(8,), seed=0):
    """Bytes moved by collectives in ONE sharded EM step (traced, not run)."""
    from prosper_tpu.engine.anneal import LinearAnnealing
    from prosper_tpu.models.base import make_blank_data, sched_from_anneal
    from prosper_tpu.parallel.mesh import MeshRuntime

    axes = ("data", "state")[: len(mesh_shape)]
    rt = MeshRuntime(mesh_shape=mesh_shape, axis_names=axes)
    rng = np.random.default_rng(seed)
    data = make_blank_data(
        np.zeros((N, model.D), np.float32))
    data = {k: np.asarray(v) for k, v in data.items()}
    sched = sched_from_anneal(LinearAnnealing(10))
    key = jax.random.PRNGKey(0)

    from functools import partial
    import inspect
    kw = {"axis_name": rt.data_axis}
    if "state" in axes and rt.mesh.shape["state"] > 1:
        sig = inspect.signature(model.step_fn)
        if "state_axis" in sig.parameters:
            kw["state_axis"] = "state"
            kw["n_state_shards"] = rt.mesh.shape["state"]
    from jax.sharding import PartitionSpec as P
    fn = partial(model.step_fn, **kw)
    mapped = jax.shard_map(fn, mesh=rt.mesh,
                           in_specs=(P(), P(rt.data_axis), P(), P()),
                           out_specs=(P(), P(rt.data_axis), P()),
                           check_vma=False)
    jaxpr = jax.make_jaxpr(mapped)(params, data, sched, key)
    hits = []
    _walk(jaxpr.jaxpr, 1, hits)
    total = sum(b * m for _, b, m in hits)
    n_coll = sum(m for _, _, m in hits)
    return total, n_coll, hits


def efficiency(dps_chip, N_global, B, n_coll, P):
    t_comp = (N_global / P) / dps_chip
    t_comm = n_coll * T_LAT + 2.0 * B * (P - 1) / P / BW_RING
    return t_comp / (t_comp + t_comm), t_comp, t_comm


def main():
    from prosper_tpu.models.gsc import GSC
    from prosper_tpu.models.linear import BSC, DSC, TSC
    from prosper_tpu.models.mca import MCA, MMCA

    N = 8 * 8192
    rng = np.random.default_rng(2)
    y0 = np.abs(rng.standard_normal((256, 64)).astype(np.float32))

    fams = {
        "bsc": BSC(256, 300, 8, 4, chunk=8192),
        "tsc": TSC(256, 300, 6, 3, chunk=8192),
        "dsc": DSC(256, 300, 5, 3, phi=(-1.0, 1.0, 2.0), chunk=8192),
        "gsc": GSC(256, 300, 6, 3, chunk=8192),
        "mca": MCA(256, 300, 6, 3, chunk=8192),
        "mmca": MMCA(256, 300, 6, 3, chunk=8192),
    }
    print(f"{'family':8s} {'psum KB/step':>12s} {'n_coll':>7s} "
          f"{'eff@16 (N=1e6)':>15s} {'t_comp ms':>10s} {'t_comm us':>10s}")
    rows = {}
    for name, model in fams.items():
        params = model.standard_init(
            {"y": np.abs(rng.standard_normal(
                (256, model.D)).astype(np.float32))}, seed=4)
        B, n_coll, hits = step_comm_bytes(model, params, N)
        dps = PEAK_DPS.get(name, 10e6)
        eff, t_comp, t_comm = efficiency(dps, 1_000_000, B, n_coll, 16)
        rows[name] = (B, n_coll, eff)
        print(f"{name:8s} {B/1024:12.1f} {n_coll:7d} {eff:15.4f} "
              f"{t_comp*1e3:10.2f} {t_comm*1e6:10.1f}")
    # the breakeven: how small can the per-chip batch get before eff < 0.9?
    name = "bsc"
    B, n_coll, _ = rows[name][0], rows[name][1], None
    dps = PEAK_DPS[name]
    t_comm = n_coll * T_LAT + 2.0 * B * 15 / 16 / BW_RING
    n_break = dps * t_comm * 9.0   # t_comp >= 9 t_comm  <=>  eff >= 0.9
    print(f"\nbsc eff>=0.9 requires >= {n_break:,.0f} datapoints/chip/step "
          f"(global N >= {16*n_break:,.0f} on v5e-16)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
