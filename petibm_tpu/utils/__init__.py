"""Utilities: stage timers, misc helpers."""
