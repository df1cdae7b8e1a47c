"""Data generation and IO: deterministic relation builders and .tbl files."""
