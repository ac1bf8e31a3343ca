from prosper_tpu.parallel.mesh import (
    MeshRuntime,
    maybe_psum,
    maybe_pmax,
    maybe_pmin,
    pprint,
    stride_data,
)

__all__ = [
    "MeshRuntime",
    "maybe_psum",
    "maybe_pmax",
    "maybe_pmin",
    "pprint",
    "stride_data",
]
