"""CLI inspection tools (reference cmd/packview, cmd/walview)."""
