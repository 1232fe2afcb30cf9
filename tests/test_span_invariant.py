"""The north-rule per-row invariant: span-sequence equality on
(kind, text, media_ref, order). The engine's explode path must be lossless
and order-preserving — a document reassembled from the exploded spans is
byte-identical to the input."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.sources import interleaved_documents


def test_span_sequence_roundtrip(spark, sf_dir):
    docs = interleaved_documents(spark, sf_dir).cache()

    exploded = docs.select(
        "doc_id", F.posexplode("spans").alias("span_order", "span")
    )
    reassembled = (
        exploded.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_order", "span"))
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.transform(F.col("ordered"), lambda x: x["span"]).alias("spans"),
        )
    )
    orig = docs.select("doc_id", "spans")
    # exact per-row equality on (kind, text, media_ref, offset) in order
    diff = orig.join(reassembled.withColumnRenamed("spans", "spans2"), "doc_id")
    mismatches = diff.filter(~(F.col("spans") == F.col("spans2"))).count()
    assert mismatches == 0
    assert reassembled.count() == orig.count()
    docs.unpersist()


def test_span_order_is_offset_order(spark, sf_dir):
    """Span order (array position) and the offset column agree — position
    posexplode emits is the semantic order the invariant compares."""
    docs = interleaved_documents(spark, sf_dir)
    exploded = docs.select(
        "doc_id", F.posexplode("spans").alias("span_order", "span")
    )
    bad = exploded.filter(
        F.col("span.offset") != F.col("span_order") * 100
    ).count()
    assert bad == 0
