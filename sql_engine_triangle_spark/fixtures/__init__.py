"""Deterministic reference-parity fixture generation (FIXTURES.md)."""
