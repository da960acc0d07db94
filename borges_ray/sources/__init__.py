"""Sources / sinks (SURVEY.md §2.1)."""

from .io import read_csv, read_jsonl, read_table, write_jsonl, write_table  # noqa: F401
