"""Sinks: B3DM binary emission + batch tile materialization (seed path)."""
