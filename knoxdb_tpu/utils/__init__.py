"""Shared host utilities (keyform limbs; SURVEY.md pkg/num analog)."""

from . import limbs  # noqa: F401
