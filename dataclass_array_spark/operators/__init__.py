"""Reusable distributed operators beyond Spark's built-in surface:
as-of joins, sessionization, top-k per group, dedup family, similarity
search, text analysis.  All designed shuffle-minimal for 100 TB."""
