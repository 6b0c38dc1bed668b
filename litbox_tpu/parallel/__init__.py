from .rbt_sharded import (
    sharded_rbt_resolve,
    sharded_rbt_resolve_bins,
    sharded_rbt_trace_frame,
    zero_sources_sharded,
)
from .sharded import make_mesh, sharded_trace_frame

__all__ = [
    "make_mesh",
    "sharded_trace_frame",
    "sharded_rbt_trace_frame",
    "sharded_rbt_resolve",
    "sharded_rbt_resolve_bins",
    "zero_sources_sharded",
]
