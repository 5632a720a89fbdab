"""Plan inspection helpers (explain, pushdown checks)."""
