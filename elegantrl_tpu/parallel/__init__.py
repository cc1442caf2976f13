from .mesh import make_mesh, shard_train_carry  # noqa: F401
