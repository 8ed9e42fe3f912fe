"""Execution layer: device segment store, predicate rewrite, fused scan,
host oracle (SURVEY.md L5 analog)."""

from . import device, oracle, rewrite, scan  # noqa: F401
