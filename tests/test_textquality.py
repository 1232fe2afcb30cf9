"""Repetition-quality signals and segment-level dedup, each replayed
bit-for-bit in DuckDB inside the test (the gate roster is full, so the
oracle lives here instead of __spark_entry__.oracle_sql)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from simplecommoncrawlextractor_spark.operators.textquality import (
    duplicate_substring_spans,
    remove_duplicate_segments,
    remove_duplicate_substrings,
    repetition_report,
    segment_duplicate_groups,
    substring_dup_report,
)

SEP = "\n\n"


@pytest.fixture(scope="module")
def para_docs(spark, tmp_path_factory):
    """Deterministic paragraph corpus: 40 docs × 4 paragraphs; every 3rd
    paragraph is the shared boilerplate 'para-common-<k%5>' (so each of the
    5 boilerplates recurs across many docs), the rest are unique."""
    rows = []
    for d in range(40):
        paras = []
        for j in range(4):
            k = d * 4 + j
            if k % 3 == 0:
                paras.append(f"para-common-{k % 5} shared text")
            else:
                paras.append(f"para-unique-{d}-{j} body {k}")
        rows.append((d, SEP.join(paras)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path_factory.mktemp("paras") / "paras.parquet")
    pdf.to_parquet(path)
    return path


def test_repetition_report_matches_duckdb(spark, sf_dir):
    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    got = sorted(
        tuple(r) for r in repetition_report(docs).collect()
    )
    want = sorted(
        tuple(int(v) for v in row)
        for row in duckdb.sql(f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
    FROM read_parquet('{path}')
  ) WHERE tok <> ''
),
uni AS (SELECT doc_id, tok, count(*) c FROM toks GROUP BY 1, 2),
unid AS (
  SELECT doc_id, sum(c) n_tokens, count(*) n_distinct, max(c) top_uni
  FROM uni GROUP BY 1
),
warr AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') w
  FROM read_parquet('{path}')
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) bg
  FROM warr WHERE len(w) >= 2
),
bic AS (SELECT doc_id, bg, count(*) c FROM bg GROUP BY 1, 2),
bid AS (
  SELECT doc_id, max(c) top_bi,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) dup_bi
  FROM bic GROUP BY 1
)
SELECT u.doc_id, n_tokens, n_distinct,
  (10000 * (n_tokens - n_distinct)) // n_tokens AS dup_token_bp,
  (10000 * top_uni) // n_tokens AS top_unigram_bp,
  COALESCE(CASE WHEN n_tokens > 1 THEN (10000 * top_bi) // (n_tokens - 1) END, 0)
    AS top_bigram_bp,
  COALESCE(CASE WHEN n_tokens > 1 THEN (10000 * dup_bi) // (n_tokens - 1) END, 0)
    AS dup_bigram_bp
FROM unid u LEFT JOIN bid USING (doc_id)
""").fetchall()
    )
    assert got == want


def test_repetition_report_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "p q p q p q")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_report(df).collect()}
    # doc 1: 4 tokens {a:3,b:1}; bigrams [a a, a a, a b] -> top 'a a'=2, dup=2
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 2
    assert got[1]["dup_token_bp"] == 5000
    assert got[1]["top_unigram_bp"] == 7500
    assert got[1]["top_bigram_bp"] == (10000 * 2) // 3
    assert got[1]["dup_bigram_bp"] == (10000 * 2) // 3
    # doc 2: single token -> bigram stats are 0, not div-by-zero
    assert got[2]["top_bigram_bp"] == 0 and got[2]["dup_bigram_bp"] == 0
    # doc 3: 'p q' x3 + 'q p' x2 -> all 5 bigram occurrences duplicated
    assert got[3]["top_bigram_bp"] == 6000
    assert got[3]["dup_bigram_bp"] == 10000


def test_segment_duplicate_groups_matches_duckdb(spark, para_docs):
    docs = spark.read.parquet(para_docs)
    got = sorted(tuple(r) for r in segment_duplicate_groups(docs).collect())
    want = sorted(
        (row[0], int(row[1]), int(row[2]))
        for row in duckdb.sql(f"""
WITH segs AS (
  SELECT doc_id, seg FROM (
    SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) seg
    FROM read_parquet('{para_docs}')
  ) WHERE trim(seg) <> ''
)
SELECT seg, count(*), count(DISTINCT doc_id)
FROM segs GROUP BY 1 HAVING count(*) > 1
""").fetchall()
    )
    assert got == want
    assert len(got) == 5  # the five boilerplate paragraphs


def test_remove_duplicate_segments_matches_duckdb(spark, para_docs):
    docs = spark.read.parquet(para_docs)
    got = sorted(tuple(r) for r in remove_duplicate_segments(docs).collect())
    want = sorted(
        duckdb.sql(f"""
WITH segs AS (
  SELECT doc_id, u.pos seg_pos, u.seg FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(string_split(text, chr(10) || chr(10))) + 1),
             i -> {{'pos': i, 'seg': string_split(text, chr(10) || chr(10))[i]}}
           )) u
    FROM read_parquet('{para_docs}')
  ) WHERE trim(u.seg) <> ''
),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_pos) rn
    FROM segs
  ) WHERE rn = 1
),
rebuilt AS (
  SELECT doc_id, string_agg(seg, chr(10) || chr(10) ORDER BY seg_pos) AS text
  FROM kept GROUP BY 1
)
SELECT t.doc_id, COALESCE(r.text, '') AS text
FROM read_parquet('{para_docs}') t LEFT JOIN rebuilt r USING (doc_id)
""").fetchall()
    )
    assert got == want
    # every boilerplate paragraph survives exactly once corpus-wide
    joined = "\n\n".join(t for _, t in got)
    for k in range(5):
        assert joined.count(f"para-common-{k} shared text") == 1


def test_remove_duplicate_segments_keeps_min_doc_min_pos(spark):
    df = spark.createDataFrame(
        [(5, "dup\n\nb5"), (2, "a2\n\ndup"), (9, "dup\n\ndup")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in remove_duplicate_segments(df).collect()}
    # 'dup' survives only at its (min doc_id=2, min pos) occurrence
    assert got[2] == "a2\n\ndup"
    assert got[5] == "b5"
    assert got[9] == ""


def test_duplicate_substring_spans_matches_duckdb(spark, sf_dir):
    """Lee-et-al-style duplicated n-gram span detection, replayed in
    DuckDB: same windows, same corpus-wide dup test, same
    gaps-and-islands merge."""
    path = f"{sf_dir}/documents.parquet"
    n = 8
    docs = spark.read.parquet(path)
    got = sorted(
        tuple(r)
        for r in duplicate_substring_spans(docs, n=n).collect()
    )
    want = sorted(
        tuple(int(v) for v in row)
        for row in duckdb.sql(f"""
WITH t AS (SELECT doc_id, list_filter(string_split_regex(text,'\\s+'), x->x<>'') w
           FROM read_parquet('{path}')),
g AS (SELECT doc_id, i-1 AS pos, list_aggregate(w[i:i+{n}-1], 'string_agg', ' ') AS gram
      FROM t, UNNEST(generate_series(1, len(w)-{n}+1)) u(i) WHERE len(w) >= {n}),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN gap IS NULL OR gap > {n} - 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (SELECT doc_id, pos,
               pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
        FROM hits)
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {n} - 1 AS span_end,
       count(*) AS n_windows
FROM isl GROUP BY doc_id, island
""").fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_substring_dup_report_coverage_bounds(spark, sf_dir):
    """Coverage is 0 for clean docs, ≤ n_tokens always, and exactly
    n_tokens for a doc that is a full duplicate of another."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c d e f g h unique tail one",
                "a b c d e f g h unique tail one",  # full dup of doc 0
                "totally different words with no overlap at all here",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {r["doc_id"]: r for r in substring_dup_report(docs, n=8).collect()}
    assert got[0]["dup_tokens"] == got[0]["n_tokens"] == 11
    assert got[0]["dup_cov_bp"] == 10000
    assert got[1]["dup_cov_bp"] == 10000
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_cov_bp"] == 0
    for r in got.values():
        assert 0 <= r["dup_tokens"] <= r["n_tokens"]


def test_remove_duplicate_substrings_keeps_first_occurrence(spark):
    """Hand-built: doc 0 and doc 2 share a 10-token run; doc 0 is the
    corpus-first occurrence and keeps it verbatim, doc 2 loses exactly
    those tokens; unique text is untouched everywhere."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (0, f"{shared} tail-a tail-b"),
        (1, "completely unrelated\twords here\n\nthat repeat nothing at all"),
        (2, f"lead-x lead-y {shared}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_substrings(docs, n=8).collect()
    }
    assert got[0] == f"{shared} tail-a tail-b"      # winner untouched
    # clean doc: ORIGINAL bytes preserved, tabs/newlines included
    assert got[1] == rows[1][1]
    assert got[2] == "lead-x lead-y"                # loser loses the run


def test_remove_duplicate_substrings_matches_duckdb(spark, sf_dir):
    """Corpus replay in DuckDB: same winners (min (doc,pos)), same
    cut-token resolution, same reassembly."""
    path = f"{sf_dir}/documents.parquet"
    n = 8
    docs = spark.read.parquet(path)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_substrings(docs, n=n).collect()
    }
    want = dict(
        duckdb.sql(f"""
WITH t AS (SELECT doc_id, list_filter(string_split_regex(text,'\\s+'), x->x<>'') w
           FROM read_parquet('{path}')),
g AS (SELECT doc_id, i-1 AS pos, list_aggregate(w[i:i+{n}-1], 'string_agg', ' ') AS gram
      FROM t, UNNEST(generate_series(1, len(w)-{n}+1)) u(i) WHERE len(w) >= {n}),
pg AS (
  SELECT gram, count(*) AS c,
         min({{'d': doc_id, 'p': pos}}) AS win
  FROM g GROUP BY gram
),
dup AS (SELECT gram, win FROM pg WHERE c > 1),
hits AS (
  SELECT g.doc_id, g.pos,
         (g.doc_id = dup.win.d AND g.pos = dup.win.p) AS is_winner
  FROM g JOIN dup USING (gram)
),
covered AS (
  SELECT doc_id, u.ti, is_winner
  FROM hits, UNNEST(generate_series(pos, pos + {n} - 1)) u(ti)
),
cut AS (
  SELECT doc_id, ti FROM covered GROUP BY doc_id, ti
  HAVING NOT bool_or(is_winner)
),
stream AS (
  SELECT doc_id, u.i - 1 AS ti, w[u.i] AS tok
  FROM t, UNNEST(generate_series(1, len(w))) u(i)
),
kept AS (
  SELECT s.doc_id, s.ti, s.tok FROM stream s
  LEFT JOIN cut c ON s.doc_id = c.doc_id AND s.ti = c.ti
  WHERE c.doc_id IS NULL
),
touched AS (SELECT DISTINCT doc_id FROM cut)
SELECT t.doc_id,
       CASE WHEN t.doc_id IN (SELECT doc_id FROM touched)
            THEN coalesce((SELECT string_agg(tok, ' ' ORDER BY ti)
                           FROM kept k WHERE k.doc_id = t.doc_id), '')
            ELSE (SELECT text FROM read_parquet('{path}') o
                  WHERE o.doc_id = t.doc_id) END AS text
FROM t
""").fetchall()
    )
    assert got == want
    assert any(got[d] != r for d, r in
               ((row[0], row[1]) for row in
                duckdb.sql(f"SELECT doc_id, text FROM read_parquet('{path}')").fetchall()))
