"""etl_geonames_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the
``nypl-spacetime/etl-geonames`` reference module (a Node.js streaming
ETL job: scan → parse → filter → broadcast-lookup-join → project/nest
→ flatMap → NDJSON sink), generalized into a full DataFrame-first
engine with relational operators, time/window analytics, a vectorized
UDF surface, and LLM-training-data pipeline operators (dedup,
similarity search, text analysis, multimodal column plumbing).

Design principles (SURVEY.md §7.0):
  - DataFrame ops over Parquet; logical plans are declared, Catalyst
    picks the physical strategy.
  - Zero Python UDFs for reference-parity operators — everything the
    reference computes decomposes into built-in JVM expressions.
  - Broadcast-shaped lookups (dimension tables, allowlists, type maps)
    use explicit ``F.broadcast`` / literal maps: at 100 TB fact scale
    the dimensions stay small.
  - Pandas (Arrow-vectorized) UDFs only where built-ins genuinely
    cannot express the semantics (multimodal decode, arbitrary
    stateful streaming) — even SimHash decomposes into JVM bitwise
    expressions.
"""

__version__ = "0.1.0"

from etl_geonames_spark.session import get_spark  # noqa: F401
