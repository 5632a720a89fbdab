"""Structured Streaming operators (reference R12/R13 generalized)."""
