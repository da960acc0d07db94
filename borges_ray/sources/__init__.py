"""Sources / sinks (SURVEY.md §2.1)."""

from .io import (  # noqa: F401
    read_binary,
    read_csv,
    read_jsonl,
    read_table,
    sample,
    write_jsonl,
    write_table,
)
