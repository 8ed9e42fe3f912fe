"""Schema + wire codec (SURVEY.md L9 pkg/schema analog)."""

from . import schema, wire  # noqa: F401
from .schema import Builder, Field, Schema, field_meta, schema_of  # noqa: F401
