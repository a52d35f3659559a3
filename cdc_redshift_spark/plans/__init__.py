"""Logical plan builders: merge/upsert semantics, table routing."""
