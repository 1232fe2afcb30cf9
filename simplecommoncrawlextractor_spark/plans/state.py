"""Snapshot-pinned state tables + the partitioned bloom URL-seen set.

The reference's persistent "seen" state is a digest-addressed filesystem:
existence of ``<root>/<digest[0:2]>/<digest>`` means already-fetched, and a
re-run skips it (cc/warc/Extractor.java:89-91,159-162;
cc/CCGetter.java:134-140,236-240). Deletions exist too: RefetchedDeleter
removes a percentage of truncated files (cc/RefetchedDeleter.java:37-43).

Spark-first re-expression:
- **url_seen**: exact ``(bucket, url_hash)`` rows, hash-bucketed (the analog
  of the digest[0:2] shard), stored as Parquet partitioned by bucket.
- **bloom side-structure**: one bloom-filter blob per bucket, built and
  merged with ``applyInPandas`` (each task owns whole buckets — no
  read-modify-write races). Probing a candidate batch co-groups candidates
  with their bucket's blob; bloom-negative rows are *definitely* unseen and
  skip the exact join entirely; bloom-positive rows are confirmed with a
  bucket-pruned left-anti join (false positives survive). Catalyst's runtime
  bloom join filter can't do this: it is per-query, ours persists across runs.
- **deletes** (the cuckoo-filter role): exact rows make deletion trivial —
  affected buckets are rewritten and ONLY their blobs rebuilt (bounded by
  one bucket's cardinality). For rebuild-free deletes, ``CuckooSeenSet``
  (bottom of this module) is the drop-in alternative the north rule names:
  same bucket-blob shape and probe algebra, but delete() clears one stored
  fingerprint per victim IN PLACE, and membership is provably independent
  of insertion order / kick history (the partial-key involution), so any
  task layout yields identical probe answers.
- **snapshots**: every commit writes new table versions then atomically
  swaps ``manifest.json`` (os.replace). A killed run resumes from the last
  committed manifest — identical crawl ordering and seen-membership
  (north_rule). This is the Iceberg commit protocol minus the jar (no
  Iceberg runtime is available in this sandbox; the interface hides which).

Scale math (10^10 URLs, design point): 4096 buckets × ~2.4M urls/bucket ×
10 bits ≈ 3 MB/blob, 12 GB total bloom state — each task touches only its
buckets' blobs; exact rows are ~80 GB of parquet, bucket-pruned on probe.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, bitmap binary, n_bits long, n_hashes int, n_items long"
SEEN_SCHEMA = "bucket int, url_hash long"

DEFAULT_N_BUCKETS = 64
BITS_PER_ITEM = 10
N_HASHES = 7
MIN_BITS = 1 << 13  # 8 Kibit floor per bucket blob


def _probe_positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """Double-hashing probe positions: h1 + i*h2 mod n_bits (uint64 math)."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd-ish, never zero
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def _bits_for(n_items: int) -> int:
    return max(MIN_BITS, 1 << int(np.ceil(np.log2(max(1, n_items) * BITS_PER_ITEM))))


def _build_blob(hashes: np.ndarray, n_bits: int) -> bytes:
    bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _probe_positions(hashes, n_bits, N_HASHES).ravel()
        np.bitwise_or.at(bitmap, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bitmap.tobytes()


def _test_blob(hashes: np.ndarray, bitmap: bytes, n_bits: int, n_hashes: int) -> np.ndarray:
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    bm = np.frombuffer(bitmap, dtype=np.uint8)
    pos = _probe_positions(hashes, n_bits, n_hashes)
    hit = (bm[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=0).astype(bool)


class BloomSeenSet:
    """Partitioned bloom URL-seen set over (bucket, url_hash) exact rows.

    Backend facade (shared with ``CuckooSeenSet`` so ``CrawlScheduler``
    stays branch-free): ``blob_schema``, ``merge_delta``, ``delete_delta``,
    ``probe`` — both backends confirm suspects against the exact rows, so
    probe OUTPUT is identical regardless of blob kind; only the blob
    maintenance algebra differs (bloom: OR-bits + rebuild-on-overfull /
    rebuild-on-delete; cuckoo: slot insert + in-place fingerprint clear)."""

    blob_schema = BLOOM_SCHEMA

    def __init__(self, n_buckets: int = DEFAULT_N_BUCKETS):
        self.n_buckets = n_buckets

    def bucketize(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int")
        )

    def build_blooms(self, seen_rows: DataFrame) -> DataFrame:
        """(bucket, url_hash) rows → one bloom blob per bucket.

        applyInPandas per bucket: each task owns whole buckets, so blob
        construction is race-free by partitioning, not by locking.
        """

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            n_bits = _bits_for(len(hashes))
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "bitmap": [_build_blob(hashes, n_bits)],
                    "n_bits": [n_bits],
                    "n_hashes": [N_HASHES],
                    "n_items": [len(hashes)],
                }
            )

        return seen_rows.groupBy("bucket").applyInPandas(build, BLOOM_SCHEMA)

    def probe(
        self,
        candidates: DataFrame,
        seen_rows: DataFrame,
        blooms: DataFrame,
        materialize: bool = True,
    ) -> DataFrame:
        """Return candidates NOT in the seen set (the F9/J2 anti-join,
        cc/warc/Extractor.java:89-91), bloom-accelerated.

        cogrouped applyInPandas(candidates ⨝bucket blooms) emits ONLY the
        bloom-positive hashes (suspects); those are confirmed against the
        exact rows with a bucket-pruned semi-join, and the single final
        anti-join removes the confirmed-seen hashes from the candidates.
        Algebra: cand hashes = definite_new ∪ suspects, so
        cand ∖ (suspects ∩ seen) = definite_new ∪ (suspects ∖ seen) — the
        same set as flagging both ways, but the flag output is half the
        Arrow traffic, the flagged frame has ONE consumer (no double
        execution of the cogroup across union branches), and definite-new
        rows never enter any join.

        ``materialize`` eagerly localCheckpoints the candidate batch first:
        the plan consumes candidates TWICE (the slim hash path and the
        final anti-join), and Spark re-evaluates shared subtrees across
        join branches — for a UDF-heavy candidate chain (canonicalize)
        that re-evaluation dominates the whole probe (measured 1.8× on the
        frontier kernel). Candidate batches are per-round and bounded, and
        the scheduler checkpoints round state anyway, so the
        localCheckpoint fault-tolerance tradeoff (executor loss → recompute
        the round, not the lineage) is the one the engine already makes.
        Pass False when the caller has already persisted the batch.
        """
        # the skeleton lives in _suspects_probe, shared with
        # CuckooSeenSet so the two backends cannot drift: only the
        # 16-byte (bucket, url_hash) pair crosses the Arrow boundary —
        # never the full candidate row (at 10^10 scale the candidate
        # payload is 10-50× wider than the hash)

        def hits(row, hashes):
            return _test_blob(
                hashes, row["bitmap"], int(row["n_bits"]), int(row["n_hashes"])
            )

        return _suspects_probe(
            self, candidates, seen_rows, blooms, hits, materialize
        )

    def merge_blooms(self, blooms: DataFrame, new_rows: DataFrame) -> DataFrame:
        """OR new hashes into existing blobs (cogrouped per bucket); grows a
        blob when its item count outruns its bit budget."""

        def merge(key, bpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
            hashes = npdf["url_hash"].to_numpy(dtype=np.int64) if len(npdf) else np.array([], dtype=np.int64)
            if len(bpdf) == 0:
                n_bits = _bits_for(len(hashes))
                return pd.DataFrame(
                    {
                        "bucket": [int(key[0])],
                        "bitmap": [_build_blob(hashes, n_bits)],
                        "n_bits": [n_bits],
                        "n_hashes": [N_HASHES],
                        "n_items": [len(hashes)],
                    }
                )
            row = bpdf.iloc[0]
            n_bits, n_items = int(row["n_bits"]), int(row["n_items"]) + len(hashes)
            # growth is handled OUTSIDE this merge: rebuild_overfull_blooms
            # re-derives oversubscribed buckets from the exact rows (the
            # n_items bookkeeping below is what flags them)
            bm = np.frombuffer(row["bitmap"], dtype=np.uint8).copy()
            if len(hashes):
                pos = _probe_positions(hashes, n_bits, int(row["n_hashes"])).ravel()
                np.bitwise_or.at(bm, pos // 8, (1 << (pos % 8)).astype(np.uint8))
            return pd.DataFrame(
                {
                    "bucket": [int(key[0])],
                    "bitmap": [bm.tobytes()],
                    "n_bits": [n_bits],
                    "n_hashes": [int(row["n_hashes"])],
                    "n_items": [n_items],
                }
            )

        return (
            blooms.groupBy("bucket")
            .cogroup(self.bucketize(new_rows).groupBy("bucket"))
            .applyInPandas(merge, BLOOM_SCHEMA)
        )


    def rebuild_overfull_blooms(
        self, blooms: DataFrame, seen_rows: DataFrame
    ) -> DataFrame:
        """Grow any bucket whose item count has outrun its bit budget
        (false-positive rate would decay otherwise): rebuild just those
        buckets' blobs from the exact rows. Bucket-local, rare (a bucket
        doubles capacity each rebuild), and cheap relative to the probe
        traffic it keeps honest."""
        overfull = blooms.filter(
            F.col("n_items") * BITS_PER_ITEM > F.col("n_bits")
        ).select("bucket")
        rebuilt = self.build_blooms(
            seen_rows.join(F.broadcast(overfull), "bucket", "left_semi")
        )
        untouched = blooms.join(rebuilt.select("bucket"), "bucket", "left_anti")
        return untouched.unionByName(rebuilt)

    def delete(self, seen_rows: DataFrame, victims: DataFrame) -> tuple[DataFrame, DataFrame]:
        """The deletion path (cuckoo-filter role): remove ``victims``
        (url_hash) from the seen set so they become refetchable — the
        semantics of RefetchedDeleter (cc/RefetchedDeleter.java:37-43),
        which deletes a percentage of truncated payloads from the repo.

        Bloom blobs can't unset bits; exact rows can. We anti-join the
        victims out and rebuild blobs ONLY for buckets that lost rows —
        bucket-local work, deterministic, no eviction cascades. Returns
        (new_seen_rows, new_blooms) for the caller to commit."""
        v = self.bucketize(victims.select("url_hash")).select("bucket", "url_hash")
        remaining = seen_rows.join(v, ["bucket", "url_hash"], "left_anti")
        touched = v.select("bucket").distinct()
        rebuilt = self.build_blooms(
            remaining.join(F.broadcast(touched), "bucket", "left_semi")
        )
        return remaining, rebuilt

    # -- scheduler backend facade -----------------------------------------
    def merge_delta(
        self, touched_blobs: DataFrame, new_rows: DataFrame, seen_after: DataFrame
    ) -> DataFrame:
        """Per-round blob delta for the buckets receiving ``new_rows``:
        OR the new hashes in, then rebuild any bucket whose item count
        outran its bit budget (from ``seen_after``, the post-merge exact
        rows). Only touched buckets can newly overflow."""
        delta = self.merge_blooms(touched_blobs, new_rows)
        return self.rebuild_overfull_blooms(delta, seen_after)

    def delete_delta(
        self, seen_rows: DataFrame, victims: DataFrame, blobs: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(remaining exact rows, blob delta for touched buckets). Bloom
        bits can't unset — touched buckets rebuild from the remaining
        rows; ``blobs`` is unused (kept for backend-signature parity)."""
        return self.delete(seen_rows, victims)



class StateStore:
    """Versioned parquet tables + atomic manifest swap (Iceberg-style
    snapshot commits without the jar). Commit = write v{N+1} dirs, then
    os.replace the manifest — readers either see the old snapshot or the
    new one, never a torn state. Resume = read whatever the manifest pins.

    Three table kinds:
    - **rewrite** (``tables=``): full new version each commit (frontier).
    - **append** (``appends=``): delta part per commit, read = union
      (url_seen, fetch_log, metrics).
    - **upsert** (``upserts=``): keyed delta per commit — the manifest maps
      each key (bloom bucket id) to the part that owns its latest row, so a
      round writes ONLY the touched buckets' blobs and a read opens only
      the owning files (bucket-partitioned dirs → partition pruning). This
      is what keeps the bloom state commit O(round): untouched buckets'
      files are never rewritten, merely re-referenced. The owner map is
      bounded by n_buckets (≤4096 at the 10^10 design point) — manifest
      metadata, not data. Parts compact into a fresh base once the list
      exceeds MAX_UPSERT_PARTS.
    """

    MANIFEST = "manifest.json"
    MAX_UPSERT_PARTS = 8

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self, snapshot: int | None = None) -> str:
        if snapshot is None:
            return os.path.join(self.root, self.MANIFEST)
        return os.path.join(self.root, f"manifest-{int(snapshot)}.json")

    def manifest(self, snapshot: int | None = None) -> dict:
        """Current manifest, or a historical one (time travel): every
        commit also writes an immutable ``manifest-{sid}.json``, and table
        version dirs are never rewritten, so any past snapshot stays
        readable — the Iceberg snapshot-log semantics."""
        p = self._manifest_path(snapshot)  # sids never reused (see commit)
        if not os.path.exists(p):
            if snapshot is not None:
                raise FileNotFoundError(f"no snapshot {snapshot} in {self.root}")
            return {"snapshot": 0, "tables": {}, "meta": {}}
        with open(p) as f:
            return json.load(f)

    def snapshot_id(self) -> int:
        return int(self.manifest()["snapshot"])

    def snapshots(self) -> list[int]:
        """All retained snapshot ids, ascending."""
        out = []
        for fn in os.listdir(self.root):
            if fn.startswith("manifest-") and fn.endswith(".json"):
                out.append(int(fn[len("manifest-"):-len(".json")]))
        return sorted(out)

    def rollback(self, snapshot: int) -> int:
        """Make ``snapshot`` the current state (atomic manifest swap, like
        Iceberg's rollback-to-snapshot). Later snapshots' files stay on
        disk and readable; a subsequent commit branches the history —
        commits after a rollback write manifest-{N}.json for NEW ids above
        the rolled-back one, replacing the abandoned lineage."""
        m = self.manifest(snapshot)
        tmp = self._manifest_path() + f".tmp.rb{snapshot}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())
        return int(m["snapshot"])

    # -- retention --------------------------------------------------------
    _PART_RE = re.compile(r"^[vdum]\d+$")

    def expire_snapshots(
        self,
        keep_last: int = 1,
        older_than: float | None = None,
        orphan_grace_sec: float = 3600.0,
    ) -> dict:
        """Iceberg's expire_snapshots + orphan-file cleanup: drop
        historical ``manifest-{sid}.json`` entries beyond the retention
        policy, then delete every table part directory that no retained
        manifest references. Without this, a 10^10-URL crawl's state dir
        grows O(rounds × state) — with it, disk is bounded by
        ``keep_last`` resolvable snapshots (append deltas shared by the
        current manifest are always retained, so history stays O(crawl)
        only where the data itself is history, e.g. fetch_log).

        ``keep_last``: retain that many most-recent snapshot ids (the
        current snapshot is always retained regardless). ``older_than``:
        additionally retain any snapshot committed at/after this unix
        time. ``orphan_grace_sec``: an unreferenced part directory
        younger than this is NOT swept — a concurrent ``commit`` writes
        part files BEFORE it publishes the manifest that references
        them, so a zero-grace sweep racing such a commit would delete
        the new snapshot's data (Iceberg's ``remove_orphan_files`` has
        the same ``older_than`` guard for the same reason). The age is
        the NEWEST mtime found anywhere under the part tree, not the
        top-level directory's: for a partitioned part, writing a file
        into an existing subdirectory does not touch the top directory,
        so a large commit could look hours old at the top while still
        actively writing below. As with Iceberg's guidance,
        ``orphan_grace_sec`` must still exceed the maximum expected
        write-to-publish span of a commit. Returns
        {"expired": [...], "removed": [...part dirs...]}.
        """

        def newest_mtime(path: str) -> float:
            newest = os.path.getmtime(path)
            for walk_root, dirs, files in os.walk(path):
                for nm in dirs + files:
                    try:
                        newest = max(
                            newest, os.path.getmtime(os.path.join(walk_root, nm))
                        )
                    except OSError:
                        pass  # vanished mid-scan (concurrent GC/commit)
            return newest

        cur = self.snapshot_id()
        sids = self.snapshots()
        keep = set(sids[-keep_last:]) if keep_last > 0 else set()
        keep.add(cur)
        if older_than is not None:
            for s in sids:
                m = self.manifest(s)
                if m.get("meta", {}).get("committed_at", 0.0) >= older_than:
                    keep.add(s)
        expired = [s for s in sids if s not in keep]
        for s in expired:
            os.remove(self._manifest_path(s))
        referenced: set[str] = set()
        for m in [self.manifest()] + [self.manifest(s) for s in self.snapshots()]:
            for rel in m["tables"].values():
                if isinstance(rel, dict):
                    referenced.update(rel["parts"])
                elif isinstance(rel, list):
                    referenced.update(rel)
                else:
                    referenced.add(rel)
        removed = []
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for part in os.listdir(tdir):
                if not self._PART_RE.match(part):
                    continue  # never touch anything we didn't name
                rel = f"{table}/{part}"
                if rel not in referenced:
                    pdir = os.path.join(tdir, part)
                    try:
                        age = time.time() - newest_mtime(pdir)
                    except OSError:
                        continue  # vanished mid-scan (concurrent GC/commit)
                    if age < orphan_grace_sec:
                        continue  # possibly an in-flight commit's files
                    shutil.rmtree(pdir, ignore_errors=True)
                    removed.append(rel)
        return {"expired": expired, "removed": sorted(removed)}

    # -- read -------------------------------------------------------------
    def read(
        self, spark: SparkSession, name: str, schema: str,
        snapshot: int | None = None,
    ) -> DataFrame:
        """Read a table at the current snapshot, or at a historical one
        (``snapshot=`` time travel)."""
        rel = self.manifest(snapshot)["tables"].get(name)
        if rel is None:
            return spark.createDataFrame([], schema)
        if isinstance(rel, dict):
            return self._read_upsert(spark, rel, schema)
        parts = rel if isinstance(rel, list) else [rel]
        # read each delta dir separately and union by name: multi-root reads
        # trip Spark's partition discovery when parts mix partitioned and
        # unpartitioned layouts (bootstrap tables are unpartitioned)
        dfs = [spark.read.parquet(os.path.join(self.root, p)) for p in parts]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _read_upsert(self, spark: SparkSession, entry: dict, schema: str) -> DataFrame:
        """Resolve an upsert table: for each part, read only the keys it
        currently owns (latest writer). Disjoint by construction — a plain
        union, no shuffle, and bucket-partitioned dirs mean Spark opens
        only the owned partitions' files."""
        if not entry["owners"]:
            return spark.createDataFrame([], schema)
        cols = [f.strip().split()[0] for f in schema.split(",")]
        return self._read_upsert_entry(spark, entry).select(*cols)

    # -- commit -----------------------------------------------------------
    def commit(
        self,
        tables: dict[str, DataFrame],
        partition_by: dict[str, list[str]] | None = None,
        meta: dict | None = None,
        carry_forward: Iterable[str] = (),
        appends: dict[str, DataFrame] | None = None,
        upserts: dict[str, DataFrame] | None = None,
        upsert_keys: dict[str, str] | None = None,
    ) -> int:
        """Write new versions of ``tables``, append delta files to
        ``appends`` tables (the manifest tracks the part list — an append
        round writes only the delta, never rewrites history; this is what
        keeps per-round commit cost O(round), not O(crawl)), write keyed
        ``upserts`` deltas (only the touched keys' rows; the manifest owner
        map redirects readers), carry forward unchanged tables, then
        atomically swap the manifest."""
        m = self.manifest()
        # sid = above EVERY retained snapshot, not current+1: after a
        # rollback the current snapshot is older than the abandoned
        # lineage's, and reusing an abandoned sid would overwrite its
        # v{sid}/d{sid} data dirs while manifest-{sid}.json still points
        # at them — a time-travel read mid-overwrite would see torn
        # parquet. Allocating past max(snapshots) keeps every historical
        # manifest's dirs immutable (the Iceberg snapshot-id contract).
        sid = max([int(m["snapshot"])] + self.snapshots()) + 1
        new_tables: dict[str, str | list[str] | dict] = {}
        for name in carry_forward:
            if name in m["tables"]:
                new_tables[name] = m["tables"][name]
        for name, df in tables.items():
            rel = f"{name}/v{sid}"
            writer = df.write.mode("overwrite")
            for col in (partition_by or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(os.path.join(self.root, rel))
            new_tables[name] = rel
        for name, df in (appends or {}).items():
            rel = f"{name}/d{sid}"
            writer = df.write.mode("overwrite")
            for col in (partition_by or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(os.path.join(self.root, rel))
            prev = m["tables"].get(name, [])
            parts = prev if isinstance(prev, list) else [prev]
            new_tables[name] = parts + [rel]
        for name, df in (upserts or {}).items():
            new_tables[name] = self._commit_upsert(
                m, sid, name, df, (upsert_keys or {}).get(name, "bucket")
            )
        manifest = {
            "snapshot": sid,
            "tables": new_tables,
            "meta": {**m.get("meta", {}), **(meta or {}), "committed_at": time.time()},
        }
        # immutable snapshot-log entry first, then the atomic current swap
        with open(self._manifest_path(sid), "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = self._manifest_path() + f".tmp.{sid}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())
        return sid

    def _commit_upsert(
        self, m: dict, sid: int, name: str, df: DataFrame, keycol: str
    ) -> dict:
        """Write the delta part (bucket-partitioned), update the key→part
        owner map, and compact once the part list grows past
        MAX_UPSERT_PARTS. The distinct-key collect is bounded by the key
        domain (bloom bucket count), i.e. manifest metadata — it never
        scales with row count. An EMPTY delta writes nothing and carries
        the previous entry forward (no dead parts, no compaction churn)."""
        new_keys = [r[0] for r in df.select(keycol).distinct().collect()]
        prev = m["tables"].get(name)
        if prev is None:
            parts, owners = [], {}
        elif isinstance(prev, dict):
            parts, owners = list(prev["parts"]), dict(prev["owners"])
        else:
            # migrate a plain/append table: resolve ALL its parts into one
            # compacted base (a key's rows could live in any of them) —
            # one-time O(table) cost at the kind switch, never per-round
            spark = df.sparkSession
            prev_parts = prev if isinstance(prev, list) else [prev]
            dfs = [
                spark.read.parquet(os.path.join(self.root, p)) for p in prev_parts
            ]
            base = dfs[0]
            for d in dfs[1:]:
                base = base.unionByName(d)
            base_rel = f"{name}/m{sid}"
            base.write.mode("overwrite").partitionBy(keycol).parquet(
                os.path.join(self.root, base_rel)
            )
            prev_keys = [r[0] for r in base.select(keycol).distinct().collect()]
            parts = [base_rel]
            owners = {str(k): 0 for k in prev_keys}
        if not new_keys:
            return {"kind": "upsert", "key": keycol, "parts": parts, "owners": owners}
        rel = f"{name}/u{sid}"
        df.write.mode("overwrite").partitionBy(keycol).parquet(
            os.path.join(self.root, rel)
        )
        idx = len(parts)
        parts.append(rel)
        for k in new_keys:
            owners[str(k)] = idx
        entry = {"kind": "upsert", "key": keycol, "parts": parts, "owners": owners}
        if len(parts) > self.MAX_UPSERT_PARTS:
            # compact: materialize the resolved view as a fresh single base.
            # Amortized O(state / MAX_UPSERT_PARTS) per round — the delta
            # commits stay O(round). owners is non-empty here (new_keys
            # guaranteed it), so the resolve cannot come up empty.
            resolved = self._read_upsert_entry(df.sparkSession, entry)
            base_rel = f"{name}/v{sid}"
            resolved.write.mode("overwrite").partitionBy(keycol).parquet(
                os.path.join(self.root, base_rel)
            )
            entry = {
                "kind": "upsert",
                "key": keycol,
                "parts": [base_rel],
                "owners": {k: 0 for k in owners},
            }
        return entry

    def _read_upsert_entry(self, spark: SparkSession, entry: dict) -> DataFrame:
        """Resolve an upsert entry without a schema string (compaction path)."""
        keycol = entry["key"]
        by_part: dict[int, list[int]] = {}
        for k, i in entry["owners"].items():
            by_part.setdefault(int(i), []).append(int(k))
        dfs = []
        for i, p in enumerate(entry["parts"]):
            keys = by_part.get(i)
            if not keys:
                continue
            dfs.append(
                spark.read.parquet(os.path.join(self.root, p)).filter(
                    F.col(keycol).isin(keys)
                )
            )
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


# ---------------------------------------------------------------------------
# partitioned cuckoo-filter seen set — the deletion-friendly fallback
# ---------------------------------------------------------------------------

CUCKOO_SCHEMA = "bucket int, table binary, n_ck long, n_items long"
_CK_SLOTS = 4          # fingerprints per cuckoo bucket (standard (2,4) config)
_CK_LOAD = 0.84        # max load factor before sizing up
_CK_MAX_KICKS = 500


def _ck_fp(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the url hash — bits independent of
    the index bits (both are multiplicative mixes of the full hash)."""
    x = h.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return ((x >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _ck_i1(h: np.ndarray, n_ck: int) -> np.ndarray:
    """Primary index: high bits of a Fibonacci-mix — NOT h mod n_ck, which
    would collapse inside a partition bucket (bucket = pmod(h, n_buckets)
    already pins the low bits)."""
    x = h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((x >> np.uint64(24)) & np.uint64(n_ck - 1)).astype(np.int64)


def _ck_i2(i1: np.ndarray, fp: np.ndarray, n_ck: int) -> np.ndarray:
    """Alternate index: i1 XOR mix(fp) — an involution (i1 = alt(i2, fp)),
    the partial-key cuckoo property that makes membership layout-independent:
    if fp(q) == fp(x), then {i1,i2}(x) either equals {i1,i2}(q) or is
    disjoint from it, so a probe's answer never depends on which of its two
    buckets an item landed in (or on kick history)."""
    mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(n_ck - 1)
    return (i1.astype(np.uint64) ^ mix).astype(np.int64)


def _ck_size(n_items: int) -> int:
    n_ck = 1 << 4
    while n_ck * _CK_SLOTS * _CK_LOAD < max(n_items, 1):
        n_ck <<= 1
    return n_ck


def _bulk_place(
    tbl: np.ndarray, idx: np.ndarray, fps: np.ndarray
) -> np.ndarray:
    """Vectorized bucket placement pass: for each (idx, fp) pair, claim a
    free slot of bucket ``idx`` if its remaining capacity allows (first-
    come by position). Returns the boolean placed mask. One np.unique +
    cumcount — no per-item Python."""
    order = np.argsort(idx, kind="stable")
    sidx = idx[order]
    # rank of each item within its bucket group (0,1,2,... per bucket)
    uniq, starts, counts = np.unique(sidx, return_index=True, return_counts=True)
    rank = np.arange(len(sidx)) - np.repeat(starts, counts)
    free = _CK_SLOTS - np.count_nonzero(tbl[uniq], axis=1)
    can = rank < np.repeat(free, counts)
    # slot index = existing occupancy + within-bucket rank
    occ = np.count_nonzero(tbl[sidx], axis=1)
    placed = np.zeros(len(idx), dtype=bool)
    sel = order[can]
    tbl[idx[sel], (occ[can] + rank[can])] = fps[sel]
    placed[sel] = True
    return placed


def _ck_build(hashes: np.ndarray, n_ck: int) -> np.ndarray:
    """Insert all hashes into a fresh (n_ck, SLOTS) uint16 table.

    Two vectorized bulk passes place the overwhelming majority (primary
    buckets, then alternates for the spillover); only the residual
    contended tail walks the per-item kick loop — at the 0.84 design
    load that tail is a few percent, so the build is numpy-speed, and
    PROBES are fully vectorized regardless."""
    tbl = np.zeros((n_ck, _CK_SLOTS), dtype=np.uint16)
    # a seen SET holds each hash once: dedupe the batch first. This also
    # protects the kick loop — every copy of one hash shares a single
    # bucket pair (2·SLOTS slots at ANY table size), so a 9th copy could
    # never place and growing n_ck would not help
    hashes = np.unique(hashes)
    fps = _ck_fp(hashes)
    i1s = _ck_i1(hashes, n_ck)
    i2s = _ck_i2(i1s, fps, n_ck)
    if len(hashes) > 64:
        placed = _bulk_place(tbl, i1s, fps)
        rem = ~placed
        placed2 = np.zeros(len(hashes), dtype=bool)
        placed2[rem] = _bulk_place(tbl, i2s[rem], fps[rem])
        rem = rem & ~placed2
        fps, i1s, i2s = fps[rem], i1s[rem], i2s[rem]
    for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
        placed = False
        for idx in (i1, i2):
            row = tbl[idx]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = fp
                placed = True
                break
        if placed:
            continue
        # deterministic kick loop: evict slot (kick % SLOTS) at the
        # current index, relocate the evictee to its alternate bucket
        idx, cur = i1, fp
        for kick in range(_CK_MAX_KICKS):
            slot = kick % _CK_SLOTS
            cur, tbl[idx, slot] = int(tbl[idx, slot]), cur
            alt = _ck_i2(
                np.array([idx], dtype=np.int64),
                np.array([cur], dtype=np.uint16),
                n_ck,
            )[0]
            row = tbl[alt]
            free = np.nonzero(row == 0)[0]
            if free.size:
                row[free[0]] = cur
                break
            idx = int(alt)
        else:
            raise RuntimeError(
                f"cuckoo filter overfull at {len(hashes)} distinct items / "
                f"{n_ck * _CK_SLOTS} slots — rebuild this bucket's blob from "
                "its exact rows at a larger capacity (build_filters sizes by "
                "item count), or raise n_buckets for the design point"
            )
    return tbl


def _ck_probe(hashes: np.ndarray, tbl: np.ndarray, n_ck: int) -> np.ndarray:
    """Vectorized membership: gather both candidate buckets, compare
    fingerprints. No per-item Python — this is the hot path."""
    fps = _ck_fp(hashes)
    i1s = _ck_i1(hashes, n_ck)
    i2s = _ck_i2(i1s, fps, n_ck)
    f = fps[:, None]
    return ((tbl[i1s] == f).any(axis=1)) | ((tbl[i2s] == f).any(axis=1))


def _suspects_probe(
    seen_set, candidates: DataFrame, seen_rows: DataFrame, blobs: DataFrame,
    blob_hits, materialize: bool,
) -> DataFrame:
    """Shared probe skeleton for the bucket-blob seen sets: suspects-only
    cogroup flag → bucket-pruned exact confirm → ONE anti-join, with only
    the 16-byte (bucket, url_hash) pair crossing the Arrow boundary.
    ``blob_hits(row, hashes)`` is the per-blob membership test (bloom bit
    probe / cuckoo fingerprint gather). See BloomSeenSet.probe for the
    measured algebra and the materialize/localCheckpoint rationale — the
    semantics here must stay in lockstep for BOTH backends."""
    if materialize:
        candidates = candidates.localCheckpoint()
    cand = seen_set.bucketize(candidates)
    slim = cand.select("bucket", "url_hash")

    def flag(key, cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if len(cpdf) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int32"),
                 "url_hash": pd.Series([], dtype="int64")}
            )
        hashes = cpdf["url_hash"].to_numpy(dtype=np.int64)
        if len(bpdf) == 0:
            hits = np.zeros(len(hashes), dtype=bool)
        else:
            hits = blob_hits(bpdf.iloc[0], hashes)
        return pd.DataFrame(
            {"bucket": cpdf["bucket"][hits], "url_hash": cpdf["url_hash"][hits]}
        )

    suspects = (
        slim.groupBy("bucket")
        .cogroup(blobs.groupBy("bucket"))
        .applyInPandas(flag, "bucket int, url_hash long")
    )
    truly_seen = suspects.join(
        seen_rows, on=["bucket", "url_hash"], how="left_semi"
    ).select("url_hash")
    return candidates.join(truly_seen, "url_hash", "left_anti")


class CuckooSeenSet:
    """Partitioned cuckoo-filter URL-seen set — same outer shape as
    ``BloomSeenSet`` (one blob per partition bucket, applyInPandas
    build/probe, exact-rows confirm) but supporting IN-PLACE DELETES: a
    victim's fingerprint is cleared from its blob directly, no rebuild
    from the exact rows (the north rule's 'cuckoo fallback for
    deletions'). Each DISTINCT hash is stored once (build/insert batches
    are deduped — all copies of one hash share a single bucket pair, so
    extra copies add nothing and would only exhaust the kick loop);
    distinct hashes that collide in (fingerprint, bucket pair) keep
    separate copies, so deleting x never hides a colliding y. No false
    negatives as long as every delete corresponds to a prior insert of
    that hash and a hash is not re-inserted across batches (the seen-set
    flow guarantees both: only probe-survivors insert, and the janitor
    deletes rows it just read; ``delete_delta`` additionally presence-
    guards victims against the exact rows so even a replayed janitor call
    cannot clear a colliding stranger's fingerprint)."""

    blob_schema = CUCKOO_SCHEMA

    def __init__(self, n_buckets: int = DEFAULT_N_BUCKETS):
        self.n_buckets = n_buckets

    def bucketize(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int")
        )

    def build_filters(self, seen_rows: DataFrame) -> DataFrame:
        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            n_ck = _ck_size(len(hashes))
            tbl = _ck_build(hashes, n_ck)
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "table": [tbl.tobytes()],
                    "n_ck": [n_ck],
                    "n_items": [len(hashes)],
                }
            )

        return seen_rows.groupBy("bucket").applyInPandas(build, CUCKOO_SCHEMA)

    def probe(
        self,
        candidates: DataFrame,
        seen_rows: DataFrame,
        filters: DataFrame,
        materialize: bool = True,
    ) -> DataFrame:
        """Same algebra as BloomSeenSet.probe (shared skeleton —
        _suspects_probe). Cuckoo positives are fingerprint collisions at
        worst (~2^-13/bucket pair), negatives are definite."""

        def hits(row, hashes):
            n_ck = int(row["n_ck"])
            tbl = np.frombuffer(row["table"], dtype=np.uint16).reshape(
                n_ck, _CK_SLOTS
            )
            return _ck_probe(hashes, tbl, n_ck)

        return _suspects_probe(
            self, candidates, seen_rows, filters, hits, materialize
        )

    def insert(self, filters: DataFrame, new_rows: DataFrame) -> DataFrame:
        """Add hashes to their buckets' filters (cogrouped). Batches are
        deduped (a set stores each hash once). A bucket pushed past its
        load factor RAISES rather than growing in place: the stored
        16-bit fingerprints cannot be re-indexed at a different n_ck
        (indexes re-mix from the full hash), so capacity is fixed at
        build time — rebuild that bucket from its exact rows via
        build_filters (bounded by one bucket's cardinality), or size
        n_buckets for the design point up front (4096 at 10^10 urls)."""
        def merge(key, fpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
            hashes = np.unique(npdf["url_hash"].to_numpy(dtype=np.int64))
            if len(fpdf) == 0:
                n_ck = _ck_size(len(hashes))
                return pd.DataFrame(
                    {"bucket": [int(key[0])],
                     "table": [_ck_build(hashes, n_ck).tobytes()],
                     "n_ck": [n_ck], "n_items": [len(hashes)]}
                )
            row = fpdf.iloc[0]
            n_ck, n_items = int(row["n_ck"]), int(row["n_items"])
            tbl = np.frombuffer(row["table"], dtype=np.uint16).reshape(
                n_ck, _CK_SLOTS
            ).copy()
            total = n_items + len(hashes)
            if total > n_ck * _CK_SLOTS * _CK_LOAD:
                raise RuntimeError(
                    f"cuckoo bucket {int(key[0])} over load factor "
                    f"({total} items / {n_ck * _CK_SLOTS} slots) — rebuild "
                    "this bucket from its exact rows via build_filters"
                )
            if len(hashes):
                fps = _ck_fp(hashes)
                i1s = _ck_i1(hashes, n_ck)
                i2s = _ck_i2(i1s, fps, n_ck)
                for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
                    placed = False
                    for idx in (i1, i2):
                        free = np.nonzero(tbl[idx] == 0)[0]
                        if free.size:
                            tbl[idx, free[0]] = fp
                            placed = True
                            break
                    if not placed:
                        idx, cur = i1, fp
                        for kick in range(_CK_MAX_KICKS):
                            slot = kick % _CK_SLOTS
                            cur, tbl[idx, slot] = int(tbl[idx, slot]), cur
                            alt = _ck_i2(
                                np.array([idx], dtype=np.int64),
                                np.array([cur], dtype=np.uint16), n_ck,
                            )[0]
                            free = np.nonzero(tbl[alt] == 0)[0]
                            if free.size:
                                tbl[alt, free[0]] = cur
                                break
                            idx = int(alt)
                        else:
                            raise RuntimeError("cuckoo insert kick loop exhausted")
            return pd.DataFrame(
                {"bucket": [int(key[0])], "table": [tbl.tobytes()],
                 "n_ck": [n_ck], "n_items": [total]}
            )

        return (
            filters.groupBy("bucket")
            .cogroup(self.bucketize(new_rows).groupBy("bucket"))
            .applyInPandas(merge, CUCKOO_SCHEMA)
        )

    def delete(self, filters: DataFrame, victims: DataFrame) -> DataFrame:
        """THE cuckoo advantage over bloom: clear one stored fingerprint
        per victim in place — no rebuild from exact rows. Safe only for
        victims that were actually inserted (the standard cuckoo-filter
        contract; the scheduler's janitor deletes rows it just read, so
        the contract holds by construction)."""
        def drop(key, fpdf: pd.DataFrame, vpdf: pd.DataFrame) -> pd.DataFrame:
            if len(fpdf) == 0:
                return pd.DataFrame(
                    columns=["bucket", "table", "n_ck", "n_items"]
                ).astype({"bucket": "int32", "n_ck": "int64", "n_items": "int64"})
            row = fpdf.iloc[0]
            n_ck, n_items = int(row["n_ck"]), int(row["n_items"])
            tbl = np.frombuffer(row["table"], dtype=np.uint16).reshape(
                n_ck, _CK_SLOTS
            ).copy()
            hashes = vpdf["url_hash"].to_numpy(dtype=np.int64)
            removed = 0
            if len(hashes):
                fps = _ck_fp(hashes)
                i1s = _ck_i1(hashes, n_ck)
                i2s = _ck_i2(i1s, fps, n_ck)
                for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
                    for idx in (i1, i2):
                        hit = np.nonzero(tbl[idx] == fp)[0]
                        if hit.size:
                            tbl[idx, hit[0]] = 0
                            removed += 1
                            break
            return pd.DataFrame(
                {"bucket": [int(key[0])], "table": [tbl.tobytes()],
                 "n_ck": [n_ck], "n_items": [n_items - removed]}
            )

        return (
            filters.groupBy("bucket")
            .cogroup(self.bucketize(victims).groupBy("bucket"))
            .applyInPandas(drop, CUCKOO_SCHEMA)
        )

    # -- scheduler backend facade -----------------------------------------
    def merge_delta(
        self, touched_blobs: DataFrame, new_rows: DataFrame, seen_after: DataFrame
    ) -> DataFrame:
        """Per-round blob delta: insert the new hashes in place for buckets
        with headroom; buckets the batch would push past the load factor
        rebuild at a larger capacity from ``seen_after`` (the post-merge
        exact rows) — the cuckoo analog of rebuild_overfull_blooms, but
        detected BEFORE insert (stored 16-bit fingerprints can't be
        re-indexed at a different n_ck, so growth is always a rebuild).
        The headroom predicate is the same expression ``insert`` raises
        on, so the in-place path can never trip it."""
        incoming = (
            self.bucketize(new_rows)
            .groupBy("bucket")
            .agg(F.count_distinct("url_hash").alias("incoming"))
        )
        meta = incoming.join(
            touched_blobs.select("bucket", "n_ck", "n_items"), "bucket", "left"
        )
        overfull = meta.filter(
            F.col("n_ck").isNotNull()
            & (
                (F.col("n_items") + F.col("incoming"))
                > F.col("n_ck") * F.lit(_CK_SLOTS) * F.lit(_CK_LOAD)
            )
        ).select("bucket")
        rebuilt = self.build_filters(
            seen_after.join(F.broadcast(overfull), "bucket", "left_semi")
        )
        ok_blobs = touched_blobs.join(F.broadcast(overfull), "bucket", "left_anti")
        ok_rows = (
            self.bucketize(new_rows)
            .join(F.broadcast(overfull), "bucket", "left_anti")
            .select("url_hash")
        )
        return self.insert(ok_blobs, ok_rows).unionByName(rebuilt)

    def delete_delta(
        self, seen_rows: DataFrame, victims: DataFrame, blobs: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(remaining exact rows, blob delta) — THE cuckoo payoff: victims'
        fingerprints clear in place, no rebuild from exact rows. Victims
        are presence-guarded (semi-join against the exact rows) first:
        deleting a hash that is NOT stored could clear a distinct hash
        that collides in (fingerprint, bucket pair) — a false negative.
        The guard also makes the janitor idempotent (a replayed delete of
        an already-deleted row is a no-op)."""
        v = (
            self.bucketize(victims.select("url_hash"))
            .select("bucket", "url_hash")
            .join(seen_rows, ["bucket", "url_hash"], "left_semi")
        )
        remaining = seen_rows.join(v, ["bucket", "url_hash"], "left_anti")
        touched = v.select("bucket").distinct()
        cleared = self.delete(
            blobs.join(F.broadcast(touched), "bucket", "left_semi"), v
        )
        return remaining, cleared
