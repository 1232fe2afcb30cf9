"""Bloom URL-seen set + snapshot store unit tests."""

from __future__ import annotations

import os

import numpy as np
import pytest
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


def _bloom_files(root):
    """{relpath: (size, sha256)} of every parquet data file under blooms/."""
    import hashlib

    out = {}
    broot = os.path.join(root, "blooms")
    for dirpath, _dirs, files in os.walk(broot):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, broot)] = hashlib.sha256(f.read()).hexdigest()
    return out


def test_bloom_delta_commit_leaves_untouched_buckets_alone(spark, tmp_path):
    """A scheduler round must commit bloom blobs ONLY for buckets that
    received new hashes: every pre-existing blob file stays byte-identical
    (O(round) commit, not O(total-state)), and the new delta part holds
    only the touched buckets."""
    import json

    from simplecommoncrawlextractor_spark.plans import CrawlScheduler
    from simplecommoncrawlextractor_spark.sources import seed_frontier

    root = str(tmp_path / "delta")
    store = StateStore(root)
    sched = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    sched.bootstrap(seed_frontier(spark, n=120))
    sched.step()
    before = _bloom_files(root)
    assert before, "round 1 must have written bloom blobs"
    m1 = json.load(open(os.path.join(root, "manifest.json")))
    entry1 = m1["tables"]["blooms"]
    assert entry1["kind"] == "upsert"

    sched.step()
    after = _bloom_files(root)
    for rel, digest in before.items():
        assert after.get(rel) == digest, f"pre-existing blob rewritten: {rel}"

    m2 = json.load(open(os.path.join(root, "manifest.json")))
    entry2 = m2["tables"]["blooms"]
    assert entry1["parts"] == entry2["parts"][: len(entry1["parts"])]
    # the round-2 delta part contains only buckets round 2 actually touched
    delta_rel = entry2["parts"][-1]
    delta = spark.read.parquet(os.path.join(root, delta_rel))
    delta_buckets = {r["bucket"] for r in delta.select("bucket").distinct().collect()}
    owned_by_delta = {
        int(k) for k, i in entry2["owners"].items() if i == len(entry2["parts"]) - 1
    }
    assert delta_buckets == owned_by_delta
    # resolved view stays exact: probing every seen hash returns nothing new
    seen_rows = sched.url_seen()
    blooms = sched.blooms()
    cand = seen_rows.selectExpr("url_hash", "cast(url_hash as string) as url")
    assert sched.seen.probe(cand, seen_rows, blooms).count() == 0


def test_upsert_compaction_bounds_part_list(spark, tmp_path):
    """After many upsert commits the part list compacts into one base and
    the resolved view is unchanged."""
    root = str(tmp_path / "compact")
    store = StateStore(root)
    seen = BloomSeenSet(n_buckets=4)
    expect = {}
    for rnd in range(StateStore.MAX_UPSERT_PARTS + 3):
        rows = seen.bucketize(
            spark.range(rnd * 50, rnd * 50 + 50).selectExpr(
                "xxhash64(cast(id as string)) as url_hash"
            )
        ).select("bucket", "url_hash")
        delta = seen.build_blooms(rows)
        store.commit(tables={}, upserts={"blooms": delta})
        for r in delta.collect():
            expect[r["bucket"]] = r["n_items"]
    import json

    m = json.load(open(os.path.join(root, "manifest.json")))
    assert len(m["tables"]["blooms"]["parts"]) <= StateStore.MAX_UPSERT_PARTS
    resolved = store.read(
        spark, "blooms", "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long"
    )
    got = {r["bucket"]: r["n_items"] for r in resolved.collect()}
    assert got == expect


def test_upsert_empty_delta_carries_forward(spark, tmp_path):
    """Empty upsert deltas must not grow the part list (a crawl round
    that schedules nothing would otherwise force compaction churn and,
    once owners was empty, an IndexError at compaction)."""
    import json

    store = StateStore(str(tmp_path / "empty"))
    seen = BloomSeenSet(n_buckets=4)
    rows = seen.bucketize(
        spark.range(50).selectExpr("xxhash64(cast(id as string)) as url_hash")
    ).select("bucket", "url_hash")
    store.commit(tables={}, upserts={"blooms": seen.build_blooms(rows)})
    empty = spark.createDataFrame(
        [], "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long"
    )
    for _ in range(StateStore.MAX_UPSERT_PARTS + 2):
        store.commit(tables={}, upserts={"blooms": empty})
    m = json.load(open(os.path.join(str(tmp_path / "empty"), "manifest.json")))
    assert len(m["tables"]["blooms"]["parts"]) == 1
    got = store.read(
        spark, "blooms", "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long"
    )
    assert got.count() == 4


def test_upsert_migration_resolves_all_prev_parts(spark, tmp_path):
    """Switching a multi-part (append) table to upsert must not lose rows
    that live only in later parts."""
    store = StateStore(str(tmp_path / "mig"))
    mk = lambda b, n: spark.createDataFrame([(b, bytes([b]), 8, 1, n)],
        "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long")
    store.commit(tables={}, appends={"t": mk(0, 1)})
    store.commit(tables={}, appends={"t": mk(1, 2)}, carry_forward=["t"])
    # upsert delta touching bucket 0 only; bucket 1 (in part 2) must survive
    store.commit(tables={}, upserts={"t": mk(0, 9)})
    got = {r["bucket"]: r["n_items"] for r in store.read(
        spark, "t", "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long"
    ).collect()}
    assert got == {0: 9, 1: 2}


def test_snapshot_time_travel_and_rollback_replay(spark, tmp_path):
    """Iceberg-style snapshot semantics: every commit leaves an immutable
    manifest-{sid}.json; read(..., snapshot=N) time-travels; rollback(N) +
    replaying the remaining rounds reproduces the ORIGINAL crawl order
    byte-for-byte (everything downstream is deterministic)."""
    from simplecommoncrawlextractor_spark.plans import CrawlScheduler
    from simplecommoncrawlextractor_spark.plans.scheduler import FETCH_LOG_SCHEMA
    from simplecommoncrawlextractor_spark.sources import seed_frontier

    root = str(tmp_path / "tt")
    store = StateStore(root)
    sched = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    sched.bootstrap(seed_frontier(spark, n=150))
    frontiers = {}
    for _ in range(3):
        sched.step()
        sid = store.snapshot_id()
        frontiers[sid] = sched.frontier().count()
    original_order = [tuple(r) for r in sched.crawl_order().collect()]
    sids = store.snapshots()
    assert sids == sorted(set(frontiers) | {1})  # bootstrap + 3 steps

    # time travel: historical RESOLVED frontier counts readable without
    # rollback (the raw parts are merge-on-read storage since round 6 —
    # candidate appends + tombstones — so the resolved view is the
    # frontier, not the raw part union)
    mid = sorted(frontiers)[0]
    assert sched.frontier(snapshot=mid).count() == frontiers[mid]
    # historical fetch_log has only the rounds up to that snapshot
    assert (
        store.read(spark, "fetch_log", FETCH_LOG_SCHEMA, snapshot=mid)
        .select("round").distinct().count() == 1
    )

    # rollback to after round 1, replay rounds 2-3 → identical crawl order
    store.rollback(mid)
    sched2 = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    sched2.step()
    sched2.step()
    replayed = [tuple(r) for r in sched2.crawl_order().collect()]
    assert replayed == original_order


def test_rollback_commit_never_reuses_abandoned_sids(spark, tmp_path):
    """Commits after a rollback allocate sids ABOVE every retained
    snapshot: reusing an abandoned lineage's sid would overwrite its data
    dirs while manifest-{sid}.json still points at them, so a concurrent
    time-travel read could observe torn parquet."""
    store = StateStore(str(tmp_path / "ns"))
    s1 = store.commit({"t": spark.range(3).select(F.col("id").alias("x"))})
    s2 = store.commit({"t": spark.range(5).select(F.col("id").alias("x"))})
    store.rollback(s1)
    s3 = store.commit({"t": spark.range(7).select(F.col("id").alias("x"))})
    assert s3 > s2, f"sid {s3} reuses/undershoots the abandoned lineage (max was {s2})"
    # every snapshot — including the abandoned branch — stays readable
    assert store.read(spark, "t", "x long", snapshot=s1).count() == 3
    assert store.read(spark, "t", "x long", snapshot=s2).count() == 5
    assert store.read(spark, "t", "x long", snapshot=s3).count() == 7
    assert store.read(spark, "t", "x long").count() == 7


def test_cuckoo_seen_set_probe_matches_bloom_and_deletes_in_place(spark):
    """CuckooSeenSet: (a) probe() returns exactly the same surviving
    candidates as BloomSeenSet.probe on the same data (both are
    exact-confirmed, so the accelerator choice must be invisible),
    (b) delete() clears victims' fingerprints IN PLACE — no rebuild —
    after which deleted urls probe as unseen (refetchable) while every
    remaining url still probes seen (no false negatives), (c) insert()
    extends a bucket's filter without touching its siblings."""
    from pyspark.sql import functions as F

    from simplecommoncrawlextractor_spark.plans.state import (
        BloomSeenSet,
        CuckooSeenSet,
    )

    n = 20_000
    seen_url = F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
                        F.lit(".example.com/p/"), F.col("id").cast("string"))
    all_rows = spark.range(n).select(F.xxhash64(seen_url).alias("url_hash"))
    ck = CuckooSeenSet(n_buckets=16)
    bl = BloomSeenSet(n_buckets=16)
    seen = ck.bucketize(all_rows.filter(F.col("url_hash") % 2 == 0)).select(
        "bucket", "url_hash"
    ).cache()
    cands = all_rows.select("url_hash").cache()
    filters = ck.build_filters(seen).cache()
    blooms = bl.build_blooms(seen).cache()

    got = {r["url_hash"] for r in ck.probe(cands, seen, filters).collect()}
    want = {r["url_hash"] for r in bl.probe(cands, seen, blooms).collect()}
    assert got == want  # accelerator choice is invisible after confirm

    # (b) delete in place: victims = every 4th seen hash
    victims = seen.filter(F.col("url_hash") % 4 == 0).select("url_hash").cache()
    seen_after = seen.join(victims, "url_hash", "left_anti").cache()
    filters_after = ck.delete(filters, victims).cache()
    got2 = {
        r["url_hash"]
        for r in ck.probe(cands, seen_after, filters_after).collect()
    }
    want2 = {r["url_hash"] for r in cands.join(
        seen_after, "url_hash", "left_anti").collect()}
    assert got2 == want2  # deleted urls are refetchable, survivors still seen

    # (c) insert the victims back: membership fully restored
    filters_back = ck.insert(filters_after, victims)
    got3 = {r["url_hash"] for r in ck.probe(cands, seen, filters_back).collect()}
    assert got3 == want


def test_cuckoo_filter_no_false_negatives_and_layout_independent(spark):
    """Blob-level invariants through the Spark path: every inserted hash
    probes positive regardless of the (shuffle-dependent) insertion order
    a task saw — membership is layout-independent by the partial-key
    involution."""
    from pyspark.sql import functions as F

    from simplecommoncrawlextractor_spark.plans.state import CuckooSeenSet

    ck = CuckooSeenSet(n_buckets=8)
    rows = ck.bucketize(
        spark.range(30_000).select(F.xxhash64("id").alias("url_hash"))
    ).select("bucket", "url_hash").cache()
    f1 = ck.build_filters(rows)
    f2 = ck.build_filters(rows.repartition(32))  # different per-task order
    pos1 = rows.count() - ck.probe(
        rows.select("url_hash"), rows, f1
    ).count()
    pos2 = rows.count() - ck.probe(
        rows.select("url_hash"), rows, f2
    ).count()
    assert pos1 == pos2 == rows.count()  # zero false negatives, any layout


def test_cuckoo_blob_invariants_property():
    """Property-based (numpy-level, no Spark): for arbitrary int64 hash
    multisets — duplicates included — build() never false-negatives,
    membership is insertion-order independent, and deleting any subset
    leaves every non-deleted hash positive."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simplecommoncrawlextractor_spark.plans.state import (
        _CK_SLOTS,
        _ck_build,
        _ck_fp,
        _ck_i1,
        _ck_i2,
        _ck_probe,
        _ck_size,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
            max_size=400,
        ),
        st.randoms(use_true_random=False),
    )
    def check(raw, rnd):
        hashes = np.array(raw, dtype=np.int64)
        n_ck = _ck_size(len(np.unique(hashes)))
        tbl = _ck_build(hashes, n_ck)
        assert _ck_probe(hashes, tbl, n_ck).all()
        # order independence
        perm = list(raw)
        rnd.shuffle(perm)
        tbl2 = _ck_build(np.array(perm, dtype=np.int64), n_ck)
        probes = np.array(raw + [x + 1 for x in raw], dtype=np.int64)
        assert (_ck_probe(probes, tbl, n_ck) == _ck_probe(probes, tbl2, n_ck)).all()
        # delete half (distinct), survivors stay positive
        uniq = np.unique(hashes)
        victims, keep = uniq[::2], uniq[1::2]
        t3 = tbl.copy()
        fps, i1s = _ck_fp(victims), _ck_i1(victims, n_ck)
        i2s = _ck_i2(i1s, fps, n_ck)
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            for idx in (i1, i2):
                hit = np.nonzero(t3[idx] == fp)[0]
                if hit.size:
                    t3[idx, hit[0]] = 0
                    break
        if len(keep):
            assert _ck_probe(keep, t3, n_ck).all()

    check()


def test_expire_snapshots_retention_and_orphan_gc(spark, tmp_path):
    """Iceberg expire_snapshots semantics: old manifests drop, the
    current snapshot always survives, append deltas shared by the
    current manifest are never GC'd, and unreferenced rewrite versions
    are deleted from disk."""
    import os

    from simplecommoncrawlextractor_spark.plans import CrawlScheduler
    from simplecommoncrawlextractor_spark.plans.scheduler import FETCH_LOG_SCHEMA
    from simplecommoncrawlextractor_spark.sources import seed_frontier

    root = str(tmp_path / "exp")
    store = StateStore(root)
    sched = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    # force a frontier compaction inside the 3 rounds so superseded parts
    # exist for the GC to sweep (merge-on-read appends are otherwise all
    # referenced by the current manifest — that is the point of them)
    sched.MAX_FRONTIER_PARTS = 2
    sched.bootstrap(seed_frontier(spark, n=150))
    for _ in range(3):
        sched.step()
    order_before = [tuple(r) for r in sched.crawl_order().collect()]
    sids = store.snapshots()
    assert len(sids) == 4
    old_frontiers = {
        p for p in os.listdir(os.path.join(root, "frontier"))
    }
    # bootstrap base, one delta, the compacted base, one delta
    assert len(old_frontiers) == 4

    # orphan_grace_sec=0: this test's parts are seconds old, and the
    # point here is retention semantics, not the in-flight-commit guard
    # (covered by test_expire_snapshots_orphan_grace below)
    out = store.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert out["expired"] == sids[:-1]
    assert store.snapshots() == [sids[-1]]
    # current state unaffected — crawl order identical
    assert [tuple(r) for r in sched.crawl_order().collect()] == order_before
    # time travel to an expired snapshot now raises
    with pytest.raises(FileNotFoundError):
        store.manifest(sids[0])
    # pre-compaction frontier history physically gone; the compacted base
    # + the post-compaction delta the current manifest references remain
    left = set(os.listdir(os.path.join(root, "frontier")))
    assert len(left) == 2 and left < old_frontiers
    # append deltas from EVERY round survive (current manifest unions them)
    assert (
        store.read(spark, "fetch_log", FETCH_LOG_SCHEMA)
        .select("round").distinct().count() == 3
    )
    # removed rels all named like table/v{sid} and no longer on disk
    assert out["removed"] and all(
        not os.path.exists(os.path.join(root, rel)) for rel in out["removed"]
    )


def test_expire_snapshots_respects_rollback_current(spark, tmp_path):
    """After rollback the CURRENT snapshot is an old sid; expiry must
    retain it (and its data) even with keep_last=1 pointing elsewhere."""
    from simplecommoncrawlextractor_spark.plans import CrawlScheduler
    from simplecommoncrawlextractor_spark.sources import seed_frontier

    root = str(tmp_path / "rbx")
    store = StateStore(root)
    sched = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    sched.bootstrap(seed_frontier(spark, n=120))
    sched.step()
    mid = store.snapshot_id()
    sched.step()
    last = store.snapshot_id()
    store.rollback(mid)
    out = store.expire_snapshots(keep_last=1)
    # keep_last=1 keeps the newest sid; the rolled-back current also stays
    assert set(store.snapshots()) == {mid, last}
    assert mid not in out["expired"]
    # the rolled-back state still reads and can continue crawling
    sched2 = CrawlScheduler(spark, store, host_budget=4, salt_k=4, n_buckets=8)
    assert sched2.round_no() == 1
    sched2.step()
    assert sched2.crawl_order().count() > 0


def test_expire_snapshots_older_than_retains_recent(spark, tmp_path):
    """older_than keeps every snapshot committed at/after the cutoff even
    beyond keep_last."""
    import pyspark.sql.functions as SF

    store = StateStore(str(tmp_path / "ot"))
    df = spark.range(3).select(
        SF.col("id").cast("int").alias("bucket"), SF.col("id").alias("url_hash")
    )
    for _ in range(3):
        store.commit(tables={"t": df})
    cutoff = store.manifest(store.snapshots()[1])["meta"]["committed_at"]
    out = store.expire_snapshots(keep_last=1, older_than=cutoff)
    assert out["expired"] == [store.snapshots()[0] - 1] or out["expired"] == []
    assert set(store.snapshots()) >= {2, 3}


def test_expire_snapshots_orphan_grace(spark, tmp_path):
    """A fresh unreferenced part dir must survive the default-grace sweep
    (a concurrent commit writes parts BEFORE publishing its manifest —
    zero grace would delete the in-flight snapshot's data), and fall to
    a zero-grace sweep; aging it past the grace makes the default sweep
    take it too."""
    import os

    import pyspark.sql.functions as SF

    root = str(tmp_path / "gr")
    store = StateStore(root)
    df = spark.range(3).select(
        SF.col("id").cast("int").alias("bucket"), SF.col("id").alias("url_hash")
    )
    store.commit(tables={"t": df})
    # simulate the window inside a concurrent commit: parts on disk,
    # manifest not yet published
    inflight = os.path.join(root, "t", "v999")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    out = store.expire_snapshots(keep_last=1)  # default grace
    assert "t/v999" not in out["removed"] and os.path.isdir(inflight)
    # age it past the grace: now it is a true orphan. The sweep uses the
    # NEWEST mtime under the whole part tree (a partitioned part's
    # subdirectory writes don't touch the top directory — ADVICE r5), so
    # an abandoned part means every entry stopped changing: age them all.
    old = 1.0
    for walk_root, dirs, files in os.walk(inflight):
        for nm in dirs + files:
            os.utime(os.path.join(walk_root, nm), (old, old))
    os.utime(inflight, (old, old))
    out2 = store.expire_snapshots(keep_last=1)
    assert "t/v999" in out2["removed"] and not os.path.exists(inflight)
    # a part whose top dir looks old but whose files are still being
    # written (large partitioned commit) must SURVIVE the default sweep
    os.makedirs(inflight)
    sub = os.path.join(inflight, "host=a")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    os.utime(inflight, (old, old))  # top stale, file fresh
    out3 = store.expire_snapshots(keep_last=1)
    assert "t/v999" not in out3["removed"] and os.path.isdir(inflight)
    import shutil as _sh

    _sh.rmtree(inflight)
    # zero grace also sweeps a fresh orphan
    os.makedirs(inflight)
    out3 = store.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert "t/v999" in out3["removed"] and not os.path.exists(inflight)
