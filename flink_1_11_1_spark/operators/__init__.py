"""Relational + temporal operators the reference has and Spark lacks a
one-call API for (SURVEY.md §3.4–3.8): as-of/temporal join, interval
join, lookup join, group windows (tumble/hop/session/count), top-n,
deduplicate, CDC changelog decode.  Everything is a composition of
DataFrame ops — no RDDs, no Python in the hot path.
"""
