"""Data sources: deterministic synthetic tables + read helpers."""
