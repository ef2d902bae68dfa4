"""Placeholder — filled in as the suite grows."""
