from .checkpoint import save_pytree, load_pytree  # noqa: F401
