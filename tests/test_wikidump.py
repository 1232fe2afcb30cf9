"""S9 lexer + JSON mapper-chain loader parity
(wikilinks/ExternalLinkExtractor.java:50-183, schema/FieldMapper.java:37-120)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from simplecommoncrawlextractor_spark.functions.mappers import (
    apply_mapper_chain,
    load_field_mapper_config,
    load_field_mapper_json,
    url_util_clean,
)
from simplecommoncrawlextractor_spark.sources.wikidump import (
    _lex_values_line,
    wiki_external_links,
)

REF_JSON = "/root/reference/cc-extractor/src/main/resources/url_mappings.json"


def test_lexer_escape_and_alignment():
    # quoted commas/parens must not split cells; backslash emits next char
    # verbatim (\' -> ', \\ -> \, \n -> literal n); only column 3 captured
    line = (
        "INSERT INTO `externallinks` VALUES "
        "(1,0,'it''s, (a) test','http://a.com/x','i'),"
        "(2,0,'t\\'wo','http://b.com/\\'q\\\\p\\nz','i'),"
        "(3,0,'x','//proto.rel/p','i');"
    )
    got = _lex_values_line(line)
    assert got == ["http://a.com/x", "http://b.com/'q\\pnz", "//proto.rel/p"]


def test_lexer_skips_non_values_lines_and_unquoted_cells():
    assert _lex_values_line("CREATE TABLE `externallinks` (el_id int);") == []
    # unquoted numeric col 3 is captured too (readRecord's default branch)
    assert _lex_values_line("VALUES (1,2,3,40,5)") == ["40"]
    # record with col3 last (close paren flushes the cell)
    assert _lex_values_line("VALUES (1,2,3,'http://x.y/z')") == ["http://x.y/z"]


def test_wiki_external_links_stage(spark):
    lines = spark.createDataFrame(
        [
            ("INSERT INTO `externallinks` VALUES "
             "(1,0,'t','http://a.com/x','i'),"
             "(2,0,'t','//rel.example/p q','i'),"
             "(3,0,'t','','i'),"
             "(4,0,'t','http://blocked.bad/x','i');",),
            ("-- comment line without the keyword",),
        ],
        "value string",
    )
    rules = load_field_mapper_config(
        {"field_mapper": {"ignore_case": "true", "mappings": [
            {"f": "input_url", "t": "u", "filter": {"find": r"blocked\.bad"}},
        ]}}
    )["input_url"]
    got = {(r["host"], r["url"]) for r in wiki_external_links(lines, rules).collect()}
    # blocked.bad filtered by the chain; '' blank-dropped; the
    # protocol-relative URL gains http: but its embedded space (collapsed
    # to one by the \s+ rule) still fails the URI gate, as java.net.URI
    # would throw on it
    assert got == {("a.com", "http://a.com/x")}


def test_mapper_chain_loader_on_reference_config(spark):
    """Load the reference's shipped url_mappings.json (read-only) and check
    its documented behavior: wiki-family, big-portal and >3000-char URLs
    blank; ordinary URLs survive."""
    if not os.path.exists(REF_JSON):
        pytest.skip("reference config not present")
    rules = load_field_mapper_json(REF_JSON)["input_url"]
    assert len(rules) == 14 and all(r["kind"] == "filter" for r in rules)
    cases = {
        "http://en.wikipedia.org/wiki/X": None,
        "http://www.bbc.co.uk/news": None,
        "https://doi.org/10.1000/x": None,
        "http://archive.org/item": None,
        "http://example.com/page": "http://example.com/page",
        "http://stats.gov.cn/x": None,
        "http://" + "a" * 3000: None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = [r[0] for r in df.select(url_util_clean(F.col("u"), rules)).collect()]
    assert got == list(cases.values())


def test_mapper_chain_rule_order_capture_then_filter(spark):
    """Rule order is the file order: a capture rewriting the value runs
    before a filter that matches only the rewritten form."""
    cfg = {"field_mapper": {"ignore_case": "true", "mappings": [
        {"f": "u", "t": "u", "capture": {
            "find": r"^http://(\w+)\.example\.com/.*$",
            "replace": "http://$1.rewritten.net/",
            "fail_policy": "store_as_is"}},
        {"f": "u", "t": "u", "filter": {"find": r"bad\.rewritten\.net"}},
    ]}}
    rules = load_field_mapper_config(cfg)["u"]
    df = spark.createDataFrame(
        [("http://bad.example.com/x",), ("http://ok.example.com/y",), ("http://other.org/z",)],
        "u string",
    )
    got = [r[0] for r in df.select(apply_mapper_chain(F.col("u"), rules)).collect()]
    assert got == [None, "http://ok.rewritten.net/", "http://other.org/z"]


def test_host_drops_userinfo_and_port(spark):
    """URI.getHost() parity (ExternalLinkExtractor.java:148-151): the
    userinfo@ prefix and :port are not part of the host, while an '@'
    in the path must NOT be mistaken for userinfo."""
    line = (
        "INSERT INTO `externallinks` VALUES "
        "(1,0,'x','http://user:pw@h.example.com/x','i'),"
        "(2,0,'x','http://h2.example.com:8080/y@z','i');"
    )
    lines = spark.createDataFrame([(line,)], "value string")
    got = {r["url"]: r["host"] for r in wiki_external_links(lines).collect()}
    assert got["http://user:pw@h.example.com/x"] == "h.example.com"
    assert got["http://h2.example.com:8080/y@z"] == "h2.example.com"
