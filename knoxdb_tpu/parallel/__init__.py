"""Multi-chip scan + shuffle over jax.sharding meshes (SURVEY.md §2.4)."""

from . import shard  # noqa: F401
