from .sharded import make_mesh, sharded_trace_frame

__all__ = ["make_mesh", "sharded_trace_frame"]
