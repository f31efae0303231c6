from .mesh import create_mesh, replicate, batch_sharding, replicate_sharding
