"""Operational tools: checkpoint conversion (the reference's tools/ dir)."""
