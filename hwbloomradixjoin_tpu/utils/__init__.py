"""Timing, rooflines, profiling, and output formatting."""
