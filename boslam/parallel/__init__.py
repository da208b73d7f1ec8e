from boslam.parallel.mesh import make_mesh
from boslam.parallel.sharded import pad_edges, sharded_solve

__all__ = ["make_mesh", "pad_edges", "sharded_solve"]
