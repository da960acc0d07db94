"""Scalar function library (SURVEY.md §2.9)."""

from .strings import (  # noqa: F401
    clean_title,
    collapse_whitespace,
    doi_from_url,
    parse_year,
    reorder_author,
    zfill_id,
)
