"""Table-level data-quality and corpus operators (SURVEY.md §2.8).

These are the north-rule additions around the keyword engine: per-column
stats, cross-row uniqueness, referential checks, distribution drift,
plus large-corpus utilities (dedup, similarity search, text analysis).
Every operator is a plain function DataFrame -> DataFrame built from
stock Catalyst operators so pushdown/pruning/AQE apply untouched.
"""
