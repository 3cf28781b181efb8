"""Engine operators Spark lacks as single builtins (SURVEY §3.6/§3.8).

Each is a composition of DataFrame primitives chosen for 100 TB scale:
as-of joins avoid per-row lookups (union + window), range joins avoid
cartesian explosions (time bucketing), dedup/similarity avoid all-pairs
comparison (LSH banding / block-local math).
"""
