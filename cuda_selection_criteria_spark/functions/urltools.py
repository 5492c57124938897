"""URL canonicalization + URL-level dedup — tier 0 of a web-crawl
dedup cascade.

At Common-Crawl scale the cheapest duplicate signal is the URL itself:
the same page is re-fetched under scheme/host-case variants, default
ports, ``www.`` prefixes, tracking query params (``utm_*``, ``fbclid``,
``gclid``, ``ref``) and fragments. Canonicalizing URLs and grouping on
the canonical form removes those re-fetches *before* any text is
shingled — a pure string-expression pass (JVM whole-stage codegen, no
UDF, no shuffle) followed by one groupBy on the canonical key.

Canonicalization rules (applied in order):

1. strip the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` head (path/query case is
   significant and preserved);
3. drop default ports (``http://…:80``, ``https://…:443``);
4. drop a leading ``www.`` host label;
5. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) wherever they appear, keeping all other params in order;
6. drop a now-dangling ``?``/``&`` and, for query-less URLs, any
   trailing ``/``.

Every rule is expressible with ``regexp_replace``/``substr``/``CASE``
in both Spark SQL and ANSI-ish SQL (the DuckDB oracle in
``__spark_entry__.py`` mirrors them; the only dialect difference is
DuckDB's explicit ``'g'`` flag where Spark replaces globally by
default). ``tests/test_webtext_ops.py`` pins Spark == DuckDB on a
hand-built edge-case URL battery.

Scale notes: ``with_canonical_url`` is a narrow projection (no exchange);
``url_dedup_groups`` shuffles once on the canonical string key. Hot
hosts concentrate under one *host* but not one canonical *URL*, so the
groupBy key is naturally fine-grained; no salting needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with the DuckDB oracle (keep in sync with __spark_entry__.py)
TRACKING_PARAMS = r"(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)"


def _to_end(col: Column, start: Column) -> Column:
    """substr(col, start) to end of string (Column start, 1-based)."""
    return col.substr(start, F.length(col))


_HEAD_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def _strip_query_tail(rec: Column) -> Column:
    """Rules 5-6 over an already head-normalized URL (no sub-expression
    is referenced more than twice — safe as a single Column)."""
    rec = F.regexp_replace(rec, r"&" + TRACKING_PARAMS + r"=[^&#]*", "")
    rec = F.regexp_replace(rec, r"\?" + TRACKING_PARAMS + r"=[^&#]*&", "?")
    rec = F.regexp_replace(rec, r"\?" + TRACKING_PARAMS + r"=[^&#]*$", "")
    rec = F.regexp_replace(rec, r"[?&]+$", "")
    return F.when(
        F.instr(rec, "?") == 0, F.regexp_replace(rec, r"/+$", "")
    ).otherwise(rec)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Add the canonical form of ``url_col`` as ``out_col``.

    Staged as one named intermediate column per rule (exactly the
    oracle's CTE steps): each ``_headN`` is referenced several times by
    the next step, and Catalyst's CollapseProject does NOT re-inline a
    multi-referenced non-cheap alias — so the generated code evaluates
    each regex once. A single nested Column expression instead
    duplicates ``head`` ~6x per step, which is survivable once but
    OOMs whole-stage codegen when composed (e.g. canonicalizing an
    already-canonical column to prove idempotence).
    """
    from .spread import spread

    # spread: the staged regex chain is the heavy map stage (spread.py)
    d = spread(df).withColumn("_u", F.regexp_replace(F.col(url_col), r"#.*$", ""))
    d = d.withColumn(
        "_head0", F.lower(F.regexp_extract(F.col("_u"), _HEAD_RE, 0))
    )
    # lower() changes no lengths, so _rest can come off _head0
    d = d.withColumn(
        "_rest", _to_end(F.col("_u"), F.length("_head0") + F.lit(1))
    )
    h0 = F.col("_head0")
    d = d.withColumn(
        "_head1",
        F.when(
            h0.startswith("http://") & h0.endswith(":80"),
            h0.substr(F.lit(1), F.length(h0) - F.lit(3)),
        )
        .when(
            h0.startswith("https://") & h0.endswith(":443"),
            h0.substr(F.lit(1), F.length(h0) - F.lit(4)),
        )
        .otherwise(h0),
    )
    h1 = F.col("_head1")
    d = d.withColumn(
        "_head2",
        F.when(
            h1.startswith("http://www."),
            F.concat(F.lit("http://"), _to_end(h1, F.lit(12))),
        )
        .when(
            h1.startswith("https://www."),
            F.concat(F.lit("https://"), _to_end(h1, F.lit(13))),
        )
        .otherwise(h1),
    )
    # un-parseable (no scheme://host): canonicalize the whole string
    # through the query/path rules only.
    d = d.withColumn(
        "_rec",
        F.when(
            F.length("_head2") > 0, F.concat(F.col("_head2"), F.col("_rest"))
        ).otherwise(F.col("_u")),
    )
    d = d.withColumn(out_col, _strip_query_tail(F.col("_rec")))
    return d.drop("_u", "_head0", "_rest", "_head1", "_head2", "_rec")


# NOTE: there is deliberately no single-Column `canonicalize_url`
# convenience: it would be a third hand-synced copy of the rules
# (staged Spark + DuckDB CTE already exist), its inline duplication of
# the head sub-expressions is codegen-hostile when composed, and it
# had no production caller. Use `with_canonical_url`.


def url_dedup_groups(
    df: DataFrame,
    url_col: str = "url",
    order_col: str = "doc_id",
    min_group: int = 2,
) -> DataFrame:
    """Group rows by canonical URL; keeper = min(order_col).

    Returns ``(canon_url, keeper, n_docs)`` for groups with at least
    ``min_group`` members (the re-fetch groups a crawl dedup would
    collapse). One shuffle on the canonical key; map-side partial agg.
    """
    canon = with_canonical_url(df, url_col)
    return (
        canon.groupBy("canon_url")
        .agg(
            F.min(order_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_group)
    )


def synthetic_urls(documents: DataFrame) -> DataFrame:
    """Deterministic ``url`` column for the driver's ``documents``
    table, mirroring the input-hint page schema (url:string).

    Re-fetch groups are induced by sharing the path key
    ``doc_id % 40``; the variant class is the QUOTIENT digit
    ``(doc_id // 40) % 4`` so every group mixes variants and the
    grouping genuinely depends on canonicalization (a variant keyed on
    ``doc_id % 4`` would be constant within each base — untested
    collapse). Expressible identically in the DuckDB oracle
    (pure concat/CASE; the division is exact so float '/' is safe).
    """
    base = (F.col("doc_id") % 40).cast("string")
    variant = (
        ((F.col("doc_id") - F.col("doc_id") % 40) / 40).cast("long") % 4
    )
    url = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://WWW.CC-Archive.org/p/"), base, F.lit("/")),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("https://cc-archive.org/p/"),
                base,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            variant == 2,
            F.concat(F.lit("https://cc-archive.org:443/p/"), base, F.lit("#frag")),
        )
        .otherwise(
            F.concat(
                F.lit("https://cc-archive.org/p/"),
                base,
                F.lit("?id="),
                base,
                F.lit("&utm_medium=email"),
            )
        )
    )
    return documents.withColumn("url", url)
