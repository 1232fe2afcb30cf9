"""Bloom URL-seen set + snapshot store unit tests."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.plans.state import (
    BloomSeenSet,
    StateStore,
    _bits_for,
    _build_blob,
    _test_blob,
    N_HASHES,
)


def test_bloom_blob_no_false_negatives():
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    n_bits = _bits_for(len(hashes))
    blob = _build_blob(hashes, n_bits)
    assert _test_blob(hashes, blob, n_bits, N_HASHES).all()
    # false-positive rate sane (<3% at 10 bits/item, 7 hashes)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    fresh = probe[~np.isin(probe, hashes)]
    fp = _test_blob(fresh, blob, n_bits, N_HASHES).mean()
    assert fp < 0.03, fp


def test_bloom_probe_exact_semantics(spark):
    seen = BloomSeenSet(n_buckets=8)
    seen_rows = seen.bucketize(
        spark.range(0, 500).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    blooms = seen.build_blooms(seen_rows)
    cand = spark.range(400, 700).selectExpr(
        "xxhash64(cast(id as string)) as url_hash", "cast(id as string) as url"
    )
    out = seen.probe(cand, seen_rows, blooms)
    got = sorted(r["url"] for r in out.collect())
    assert got == [str(i) for i in range(500, 700)]  # exactly the unseen tail


def test_bloom_merge(spark):
    seen = BloomSeenSet(n_buckets=4)
    first = seen.bucketize(
        spark.range(0, 100).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    blooms = seen.build_blooms(first)
    second = spark.range(100, 200).selectExpr("xxhash64(cast(id as string)) as url_hash")
    merged = seen.merge_blooms(blooms, second)
    all_rows = seen.bucketize(
        spark.range(0, 200).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    # nothing from 0..200 may pass the probe as new
    cand = spark.range(0, 200).selectExpr(
        "xxhash64(cast(id as string)) as url_hash", "cast(id as string) as url"
    )
    assert seen.probe(cand, all_rows, merged).count() == 0


def test_statestore_atomic_snapshots(spark, tmp_path):
    store = StateStore(str(tmp_path / "state"))
    assert store.snapshot_id() == 0
    df1 = spark.range(10).selectExpr("id", "id * 2 as v")
    sid = store.commit({"t": df1})
    assert sid == 1
    df2 = spark.range(5).selectExpr("id", "id * 3 as v")
    store.commit({"t": df2}, meta={"round": 1})
    assert store.snapshot_id() == 2
    got = store.read(spark, "t", "id long, v long")
    assert got.count() == 5
    assert store.manifest()["meta"]["round"] == 1
    # carry-forward keeps old tables without rewriting
    store.commit({"u": df1}, carry_forward=["t"])
    assert store.read(spark, "t", "id long, v long").count() == 5
    assert store.read(spark, "u", "id long, v long").count() == 10
    # missing table → typed empty frame
    assert store.read(spark, "nope", "a int").count() == 0


def test_statestore_torn_commit_invisible(spark, tmp_path):
    """A crash before the manifest swap leaves the old snapshot intact."""
    store = StateStore(str(tmp_path / "state"))
    store.commit({"t": spark.range(3)})
    # simulate a half-written new version dir without a manifest swap
    os.makedirs(os.path.join(store.root, "t", "v99"), exist_ok=True)
    assert store.snapshot_id() == 1
    assert store.read(spark, "t", "id long").count() == 3


def test_rebuild_overfull_blooms(spark):
    """A bucket seeded tiny then flooded past its bit budget gets rebuilt
    at the next maintenance pass — FP rate returns to design range."""
    seen = BloomSeenSet(n_buckets=2)
    first = seen.bucketize(
        spark.range(0, 50).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    blooms = seen.build_blooms(first)  # sized for ~50 items (MIN_BITS floor)
    flood = spark.range(50, 30050).selectExpr(
        "xxhash64(cast(id as string)) as url_hash"
    )
    merged = seen.merge_blooms(blooms, flood)
    all_rows = seen.bucketize(
        spark.range(0, 30050).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    # before rebuild: blobs undersized for 15k items/bucket at MIN_BITS=8Kibit
    over = merged.filter(F.col("n_items") * 10 > F.col("n_bits")).count()
    assert over == 2
    rebuilt = seen.rebuild_overfull_blooms(merged, all_rows)
    assert rebuilt.filter(F.col("n_items") * 10 > F.col("n_bits")).count() == 0
    # correctness preserved: nothing seen may pass the probe
    cand = spark.range(0, 30050).selectExpr(
        "xxhash64(cast(id as string)) as url_hash", "cast(id as string) as url"
    )
    assert seen.probe(cand, all_rows, rebuilt).count() == 0
