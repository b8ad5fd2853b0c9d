"""Reusable relational operators: upsert/retract, latest-per-group, dedup,
similarity search."""
