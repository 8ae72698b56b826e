"""Composed pipeline graphs mirroring the reference lifecycles (SURVEY §3)."""
