from .mesh import make_mesh, shard_lanes, replicate
