"""Relational operators (SURVEY.md §2.B): scans, projection/filter/scalar
functions, joins, aggregation, windows, sort/limit/set-ops, as-of, events."""
