"""maillogsentinel_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of monozoide/MailLogSentinel.

The reference (/root/reference) is a single-threaded, stdlib-only Postfix
log analytics pipeline. This package re-expresses every capability
Spark-first (DataFrame / Spark SQL / Structured Streaming), designed for a
multi-executor cluster at 100 TB scale while staying byte-compatible with
the reference's observable outputs where tests demand it.

Layout
------
- ``session``   — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``schemas``   — explicit StructTypes for every table the engine touches
- ``functions`` — scalar expression helpers (ip_to_long, portable hashing,
                  text stats, vector math) — all JVM-side, codegen-friendly
- ``operators`` — composable DataFrame→DataFrame operators (parse, range
                  join, cached external lookup, report aggregations, dedup,
                  similarity search, sessionization, anonymization)
- ``sources``   — batch readers/writers (logs incl. gzip, geo dims, events
                  store, SQL mapping-driven sink)
- ``streaming`` — Structured Streaming ingestion (replaces the reference's
                  byte-offset state machine with checkpoints)
- ``report``    — daily-report aggregation + fixed-width text renderer
"""

__version__ = "0.1.0"
