"""Pack/segment layer: immutable column segments, zone-map stats, journal
overlay (SURVEY.md L4 analog)."""

from . import journal, segment, stats  # noqa: F401
