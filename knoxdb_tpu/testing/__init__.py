"""Deterministic scenario testing + executable assertions
(reference internal/tests/run + pkg/assert analogs)."""

from . import assert_, scenario  # noqa: F401
