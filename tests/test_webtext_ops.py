"""Round-5 webtext tier-0 operators: URL canonicalization/dedup,
CCNet-style line dedup, incremental reference dedup (exact + Bloom)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cuda_selection_criteria_spark.functions.bloom import (
    bloom_params,
    bloom_subset_gate,
    dedup_against_reference,
)
from cuda_selection_criteria_spark.functions.linededup import (
    line_dedup,
    rechunk_lines,
)
from cuda_selection_criteria_spark.functions.urltools import (
    url_dedup_groups,
    with_canonical_url,
)

# edge-case battery: one URL per canonicalization rule plus traps
# (non-default port kept, ':80'-looking path segment, scheme-less,
# kept params around stripped ones, dangling separators).
URL_BATTERY = [
    "https://WWW.Example.COM:443/A/b/?utm_source=x&utm_campaign=y#frag",
    "http://example.com:80/path?id=3&utm_medium=z&ref=abc",
    "https://example.com/?fbclid=111",
    "http://www.example.com/p/1/",
    "https://example.com/p?gclid=2&keep=1&utm_x=3",
    "ftp://Host.Example/Dir/",
    "no-scheme/path?utm_source=a",
    "https://example.com/p?utm_a=1&utm_b=2&utm_c=3",
    "https://example.com:8080/p:80/",
    "https://example.com/p?keep=1&",
    "https://example.com",
    "https://www.example.com:443/",
    "http://example.com/p?ref=zz&id=1&utm_term=q",
    # a SECOND '?' followed by a tracking param: Spark replaces
    # globally, so the DuckDB oracle needs 'g' on every step
    "https://e.com/p?utm_a=1&x=2?utm_b=3&y=4",
]


def _battery_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(URL_BATTERY)], "doc_id long, url string"
    )


def test_canonicalize_matches_duckdb_oracle(spark):
    """Spark rules == the DuckDB oracle chain on every battery URL —
    the same cross-engine agreement the driver gate checks at sf0.01,
    pinned here on the adversarial edge cases."""
    from __spark_entry__ import _URL_CANON_CTES

    got = {
        r["doc_id"]: r["canon_url"]
        for r in with_canonical_url(_battery_df(spark)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u0(doc_id BIGINT, url VARCHAR);"
    )
    con.executemany(
        "INSERT INTO u0 VALUES (?, ?)", list(enumerate(URL_BATTERY))
    )
    want = dict(
        con.execute(
            f"WITH {_URL_CANON_CTES} SELECT doc_id, canon_url FROM canon"
        ).fetchall()
    )
    assert got == want


def test_canonicalize_expected_forms(spark):
    got = {
        r["doc_id"]: r["canon_url"]
        for r in with_canonical_url(_battery_df(spark)).collect()
    }
    assert got[0] == "https://example.com/A/b"
    assert got[1] == "http://example.com/path?id=3"
    assert got[2] == "https://example.com"
    assert got[3] == "http://example.com/p/1"
    assert got[4] == "https://example.com/p?keep=1"
    assert got[5] == "ftp://host.example/Dir"  # path case preserved
    assert got[6] == "no-scheme/path"
    assert got[7] == "https://example.com/p"
    # non-default port and ':80'-looking path segment survive
    assert got[8] == "https://example.com:8080/p:80"
    assert got[9] == "https://example.com/p?keep=1"
    assert got[10] == "https://example.com"
    assert got[11] == "https://example.com"
    assert got[12] == "http://example.com/p?id=1"
    assert got[13] == "https://e.com/p?x=2?y=4"


def test_canonicalize_idempotent(spark):
    # compare via collect, NOT a `where(again != url)` predicate:
    # filter pushdown substitutes both alias chains into one predicate
    # with no reference-count guard, and the doubly-composed
    # canonicalization tree grows ~6x per substituted stage — the
    # original formulation OOM'd codegen (caught live in round 5).
    once = with_canonical_url(_battery_df(spark)).select(
        "doc_id", F.col("canon_url").alias("url")
    )
    twice = with_canonical_url(once, out_col="again")
    rows = twice.collect()
    assert rows and all(r["again"] == r["url"] for r in rows)


def test_url_dedup_groups(spark):
    rows = [
        (1, "https://WWW.Site.org/a/"),
        (2, "https://site.org/a?utm_source=x"),
        (3, "https://site.org:443/a#f"),
        (4, "https://site.org/b"),  # singleton -> filtered
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = url_dedup_groups(df, order_col="doc_id").collect()
    assert len(got) == 1
    assert got[0]["canon_url"] == "https://site.org/a"
    assert got[0]["keeper"] == 1 and got[0]["n_docs"] == 3


def test_line_dedup_crafted(spark):
    boiler = "accept all cookies"
    rows = [
        (1, f"{boiler}\nunique one\nmore text"),
        (2, f"intro two\n{boiler}"),
        (3, boiler),  # all lines boilerplate -> empty survivor
        (4, None),  # NULL text must survive, not vanish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df, min_df=2).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["cleaned_text"] == "unique one\nmore text"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    assert got[2]["cleaned_text"] == "intro two"
    assert got[3]["cleaned_text"] == "" and got[3]["n_kept"] == 0
    # NULL == empty text: its single empty line is unique here
    assert got[4]["n_lines"] == 1


def test_line_dedup_order_preserved(spark):
    # kept lines must come back in original order even when the
    # boilerplate sits between them
    rows = [(1, "z last\ncommon\na first"), (2, "common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df, min_df=2).collect()}
    assert got[1]["cleaned_text"] == "z last\na first"


def test_rechunk_lines(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    out = rechunk_lines(df, words_per_line=4).collect()[0]["text"]
    assert out == "a b c d\ne f g h\ni j"


def test_incremental_exact_vs_bloom_and_gate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    exact = {
        r["doc_id"]
        for r in dedup_against_reference(docs, ref, method="exact")
        .select("doc_id")
        .collect()
    }
    bloom = {
        r["doc_id"]
        for r in dedup_against_reference(docs, ref, method="bloom")
        .select("doc_id")
        .collect()
    }
    # no false negatives ever: bloom-kept is a subset of exact-kept
    assert bloom <= exact
    # at default sizing the FP probability is ~1e-15: sets equal
    assert bloom == exact
    assert bloom_subset_gate(docs, ref).count() == 0


def test_bloom_false_positives_are_one_sided(spark):
    # force collisions with a tiny bitmap: bloom over-drops (false
    # positives) but never under-drops (containment still holds)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    tiny = dict(n_bits=256, k=2)
    exact = {
        r["doc_id"]
        for r in dedup_against_reference(docs, ref, method="exact")
        .select("doc_id")
        .collect()
    }
    bloom = {
        r["doc_id"]
        for r in dedup_against_reference(docs, ref, method="bloom", **tiny)
        .select("doc_id")
        .collect()
    }
    assert bloom <= exact
    assert len(bloom) < len(exact)  # 256 bits vs ~250 items: must collide
    assert bloom_subset_gate(docs, ref, **tiny).count() == 0


def test_bloom_broadcast_and_explode_paths_agree(spark):
    from cuda_selection_criteria_spark.functions.bloom import (
        bloom_bitmap,
        bloom_might_contain,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    bm = bloom_bitmap(ref, n_bits=4096, k=3)
    a = {
        (r["doc_id"], r["might_contain"])
        for r in bloom_might_contain(
            docs, bm, n_bits=4096, k=3, broadcast_bitmap=True
        ).collect()
    }
    b = {
        (r["doc_id"], r["might_contain"])
        for r in bloom_might_contain(
            docs, bm, n_bits=4096, k=3, broadcast_bitmap=False
        ).collect()
    }
    assert a == b


def test_bloom_probe_side_never_shuffles(spark):
    # the point of the bloom path: the new corpus must not be
    # re-partitioned — no exchange keyed on doc_id anywhere in the plan
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    out = dedup_against_reference(docs, ref, method="bloom")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(doc_id" not in plan
    # the bitmap is materialized once into a local relation — the k
    # broadcast sides must scan that data (ExistingRDD/LocalTableScan),
    # never rebuild the bit_or aggregation lineage
    assert ("Scan ExistingRDD" in plan) or ("LocalTableScan" in plan)
    assert plan.count("HashAggregate") == 0


def test_bloom_broadcast_path_nbits_bound(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.where(F.col("doc_id") % 2 == 0)
    with pytest.raises(ValueError, match="broadcast-path bound"):
        dedup_against_reference(docs, ref, method="bloom", n_bits=1 << 28)


def test_cascade_url_tier_three_hop_chain(spark):
    """url -> exact -> ngram chain: a url-removed doc whose url keeper
    is exact-removed, whose exact keeper is ngram-removed — the final
    keeper must resolve through BOTH chase joins."""
    from cuda_selection_criteria_spark.functions import dedup_cascade

    y = "alpha beta gamma delta epsilon zeta"
    z = y + " eta"  # near-dup of y (high 5-gram Jaccard), not equal
    rows = [
        (5, "https://c.org/p", z),
        (10, "https://a.org/p", y),
        (11, "https://b.org/p?utm_source=x", y),
        (12, "https://b.org/p#frag", "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {
        r["doc_id"]: (r["removed_by"], r["keeper_id"], r["final_keeper_id"])
        for r in dedup_cascade(df, url_col="url").collect()
    }
    assert set(got) == {5, 10, 11, 12}
    assert got[5] == ("none", 5, 5)
    # 10 survives url+exact tiers, ngram-removed into 5's component
    assert got[10] == ("ngram", 5, 5)
    # 11 is b.org's url keeper, exact-removed by 10 (same text)
    assert got[11] == ("exact", 10, 5)
    # 12 url-removed (keeper 11); final chases 11 -> 10 -> 5
    assert got[12] == ("url", 11, 5)


def test_cascade_url_tier_groups_null_urls(spark):
    # NULL urls form ONE tier-0 group (window PARTITION BY semantics):
    # a null-unsafe join would silently exempt them from url dedup
    from cuda_selection_criteria_spark.functions import dedup_cascade

    rows = [
        (1, None, "alpha beta gamma delta"),
        (2, None, "epsilon zeta eta theta"),
        (3, "https://a.org/x", "iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {
        r["doc_id"]: (r["removed_by"], r["final_keeper_id"])
        for r in dedup_cascade(df, url_col="url").collect()
    }
    assert got[2] == ("url", 1)
    assert got[1][0] == "none" and got[3][0] == "none"


def test_cascade_url_tier_off_is_unchanged(spark):
    # url_col=None must produce byte-identical verdicts to the
    # pre-url-tier cascade (the hash-green driver queries rely on it)
    from cuda_selection_criteria_spark.functions import dedup_cascade

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup_cascade(docs)
    rows = {tuple(r) for r in out.collect()}
    assert len(rows) == docs.count()
    # keeper closure: a final keeper is never itself a removed doc
    finals = {r[3] for r in rows}
    removed = {r[0] for r in rows if r[1] != "none"}
    assert not (finals & removed)


def test_bloom_params():
    n_bits, k = bloom_params(10_000, 1e-3)
    assert 130_000 < n_bits < 160_000  # ~14.4 bits/item at fp=1e-3
    assert k in (9, 10, 11)
    with pytest.raises(ValueError):
        dedup_against_reference(None, None, method="nope")
