"""PySpark-native CDC + analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``avensolutions/cdc-at-scale-using-spark`` (hash-fingerprint CDC diffing on
snapshot extracts), generalized into a full analytics engine: relational
operators, window functions, scalar function surface, Structured Streaming
CDC, and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Design rules (SURVEY.md §4):
- DataFrame/SQL only — no RDDs; Catalyst plans everything.
- No ``collect()`` inside any operator path; everything stays distributed.
- Deterministic outputs: no wall clock, no RNG, tie-broken sorts, rounded
  float terminals (SURVEY.md §5.3).
- 100 TB posture: broadcast small dims, two-hash-column CDC diffing to keep
  shuffles narrow, AQE on for skew, partitioned writes.
"""

from engine import registry  # noqa: F401

__all__ = ["registry"]
