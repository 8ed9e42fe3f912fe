"""Probabilistic pack filters (bloom; SURVEY.md L1 internal/filter)."""

from . import bloom  # noqa: F401
