"""KV storage backends + segment serialization (SURVEY.md L6)."""

from . import kv, segio  # noqa: F401
