"""Vector encoding layer: analysis, schemes, cost-model selection
(SURVEY.md L2 analog)."""

from . import analyze, schemes, select  # noqa: F401
