from tpugraph.dist.mesh import make_mesh, shard_operator, replicate
