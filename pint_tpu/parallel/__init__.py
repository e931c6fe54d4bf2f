from pint_tpu.parallel.mesh import host_local_mesh, make_mesh
from pint_tpu.parallel.solver import ShardedConstrainedPGD, ShardedPGD

__all__ = [
    "make_mesh",
    "host_local_mesh",
    "ShardedPGD",
    "ShardedConstrainedPGD",
]
