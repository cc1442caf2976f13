from . import nets, dists, gae  # noqa: F401
