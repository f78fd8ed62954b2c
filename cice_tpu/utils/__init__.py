"""Utility subsystems (timers, helpers)."""
