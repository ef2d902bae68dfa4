"""Relational + extension operators (SURVEY §2.3–2.8 and north-star ops)."""

from .joins import cdc_split, left_join, anti_join, semi_join  # noqa: F401
from .arrays import positional_unnest  # noqa: F401
