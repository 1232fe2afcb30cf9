"""Fuzz: the tiered vectorized canonicalizer must agree with the
row-wise reference implementation (_canon_one) on every URL shape —
prefix-colliding query keys, %-escapes, '+', valueless keys, ports,
trailing dots, uppercase."""

from __future__ import annotations

import random

from simplecommoncrawlextractor_spark.functions import canonicalize_url
from simplecommoncrawlextractor_spark.functions.urls import _canon_one


def _gen_cases(n=400, seed=7):
    rng = random.Random(seed)
    keys = ["a", "a1", "ab", "b", "z~", "k_1", "A"]
    vals = ["1", "10", "2", "", "x-y", "%20z", "w+q", "%2F"]
    hosts = ["Ex.COM", "ex.com.", "a.b.c.d", "EX.com:80", "ex.com:8443",
             "ex.com:080", "ex.com:08080"]  # zero-padded ports: numeric parity
    schemes = ["http", "HTTP", "https", "HtTpS"]
    out = []
    for i in range(n):
        qs = "&".join(
            f"{rng.choice(keys)}={rng.choice(vals)}"
            for _ in range(rng.randint(1, 4))
        )
        frag = "#f" if rng.random() < 0.3 else ""
        path = rng.choice(
            ["/p/x", "//dbl//slash", "/UP/Case", "", "/",
             # RFC 3986 classes: unreserved escapes, kept escapes,
             # dot segments (plain and %2E-smuggled), root-escaping '..'
             "/%7Euser/x", "/a%2Fb", "/%41/%6a", "/a/./b", "/a/../b",
             "/a/b/..", "/./", "/../..", "/a/%2e%2e/b", "/a/%2E/b",
             "/dots.../ok", "/a./b.", "/%3a%3A"]
        )
        out.append(f"{rng.choice(schemes)}://{rng.choice(hosts)}{path}?{qs}{frag}")
    out += [
        "https://e.com/p?a",          # valueless key -> slow path
        "https://e.com/p?a&b=2",
        "https://e.com/p?x=%41&y=+",  # escapes -> decode/encode round-trip
        "ftp://e.com/x",              # non-http -> None
        "http://user:pw@e.com/x",     # userinfo -> tier-3
        "not a url",
        # out-of-range / absurd ports: urlsplit raises -> None in BOTH
        # tiers (the arrow rewrite routes them to tier 3 explicitly)
        "http://e.com:99999/x",
        "http://e.com:99999999999999999999/x",
        "http://e.com",               # no path at all
        "https://e.com?a=1",          # query with no path
        "https://e.com#f",            # fragment with no path
        # separator-only queries sort to '': the rebuilt URL must drop
        # the '?' exactly like urlunsplit does (idempotence)
        "http://e.com/x?&",
        "http://e.com/x?&&",
        "http://e.com/x?a=1&",
    ]
    return out


def test_vectorized_matches_reference(spark):
    cases = _gen_cases()
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    got = [r[0] for r in df.select(canonicalize_url("v")).collect()]
    bad = [
        (c, g, _canon_one(c)) for c, g in zip(cases, got) if g != _canon_one(c)
    ]
    assert not bad, bad[:5]


def test_canonicalization_idempotent_hypothesis():
    """canon(canon(u)) == canon(u) for arbitrary URL-ish strings — the RFC
    3986 normalization fixpoint property. Runs on the reference tier
    (_canon_one) directly; the cross-tier fuzz above extends it to the
    vectorized tiers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(
        alphabet="abcXYZ09._~-%25%2F%7E/.?&=:#",
        min_size=0, max_size=24,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "https", "HTTP", "ftp"]),
        host=st.sampled_from(["ex.com", "EX.com.", "a.b.c", "ex.com:80", "ex.com:8443"]),
        path=seg,
        q=seg,
    )
    def check(scheme, host, path, q):
        u = f"{scheme}://{host}/{path}?{q}"
        once = _canon_one(u)
        if once is not None:
            twice = _canon_one(once)
            assert twice == once, (u, once, twice)

    check()


def test_vectorized_idempotent_on_fuzz_corpus(spark):
    """The full tiered UDF is idempotent over the fuzz corpus: feeding its
    own output back yields the same strings."""
    cases = [c for c in _gen_cases(n=300, seed=11)]
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    once = [r[0] for r in df.select(canonicalize_url("v")).collect()]
    kept = [u for u in once if u is not None]
    df2 = spark.createDataFrame([(u,) for u in kept], "v string")
    twice = [r[0] for r in df2.select(canonicalize_url("v")).collect()]
    assert twice == kept


def test_degenerate_batches_all_null_and_empty():
    """Arrow type inference on degenerate batches: an all-null or empty
    batch must come back as-is, not crash the kernel with a null-typed
    array (regression: ArrowNotImplementedError in the regex kernels)."""
    import pandas as pd

    fn = canonicalize_url.func
    assert list(fn(pd.Series([None, None], dtype=object))) == [None, None]
    assert list(fn(pd.Series([], dtype=object))) == []
    assert list(fn(pd.Series([None, "http://e.com/x", None], dtype=object))) == [
        None, "http://e.com/x", None,
    ]
