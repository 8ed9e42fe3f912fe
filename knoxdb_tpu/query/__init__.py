"""Query layer: filter condition trees + optimizer (SURVEY.md L5)."""

from . import filter  # noqa: F401
