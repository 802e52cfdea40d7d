"""Harness utilities: config composition, tracking, VTS I/O, optimization."""
