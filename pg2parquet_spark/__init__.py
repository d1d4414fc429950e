"""pg2parquet_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of exyi/pg2parquet.

The reference (`/root/reference`, exyi/pg2parquet v0.2.1) is a single-threaded
Rust CLI that ships one SQL query to a PostgreSQL server and streams the result
into one Parquet file, implementing (a) a PG-catalog→Parquet schema compiler,
(b) ~35 per-column conversion operators, and (c) a streaming columnar sink
(see SURVEY.md). This engine re-expresses all of that Spark-first:

- relational algebra (the surface the reference delegates to the PG server,
  SURVEY §2.B) is Spark SQL / DataFrame + Catalyst — see ``operators/``;
- the type-mapping semantics (SURVEY §2.A: numeric modes, interval struct,
  ranges, composites, enums, multidim arrays, pgvector) are Spark ``Column``
  expressions — see ``typemap/``;
- the sink is Spark's Parquet writer, configured — see ``export.py``;
- beyond parity: large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) — see ``operators/``.

Everything here is plain public PySpark; no RDDs, no private APIs.
"""

__version__ = "0.1.0"
