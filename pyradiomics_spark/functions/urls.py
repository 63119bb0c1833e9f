"""URL curation for Common-Crawl-style corpora: parse → normalize →
URL-level dedup → per-domain aggregation (the RefinedWeb/C4 stage-1
operations that run BEFORE any text is read).

Everything is built from ``regexp_extract`` / ``regexp_replace`` /
array expressions restricted to the Java-regex ∩ RE2 common subset (no
lookaround, no backrefs) so the exact same patterns drive Spark and any
RE2-based oracle identically — deliberately NOT ``F.parse_url``, which
has no cross-engine twin.

Normalization rules (the practical subset of RFC 3986 §6 + common
tracker stripping; each is exercised by the ``url_normalize`` gate):

1. scheme and host lowercased; a single leading ``www.`` stripped;
2. default ports ``:80`` / ``:443`` stripped (any other explicit port is
   identity-bearing and kept);
3. trailing slashes stripped from the path;
4. tracking parameters (``utm_*``, ``fbclid``, ``gclid``) removed from
   the query, remaining parameter order preserved;
5. the fragment dropped;
6. ``domain`` is the last two dot-labels of the host — a deliberate
   Public-Suffix-List-free approximation (a real deployment swaps in a
   broadcast PSL lookup table; the plan shape is identical).

Strings that do not parse as ``scheme://host...`` get a NULL
``url_norm`` (and survive dedup untouched) rather than a guess.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: query parameters that carry tracking state, not content identity
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``scheme``, ``host`` (normalized), ``domain``, ``path_norm``,
    ``query_norm`` and ``url_norm``. Pure scan-fused column expressions —
    zero shuffle/join/Python, so at 10^12 pages this is free relative to
    the scan itself and column pruning still reaches the reader."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":(80|443)$", ""), r"^www\.", ""
    )
    raw_domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    domain = F.when(raw_domain != "", raw_domain).otherwise(host)
    path = F.regexp_replace(
        F.regexp_extract(u, _PATH_RE, 1), r"/+$", ""
    )
    q_kept = F.filter(
        F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    query_norm = F.array_join(q_kept, "&")
    url_norm = F.when(
        host != "",
        F.concat(
            host,
            path,
            F.when(query_norm != "", F.concat(F.lit("?"), query_norm))
            .otherwise(F.lit("")),
        ),
    )
    return (
        df.withColumn("scheme", F.when(scheme != "", scheme))
        .withColumn("host", F.when(host != "", host))
        .withColumn("domain", F.when(host != "", domain))
        .withColumn("path_norm", F.when(host != "", path))
        .withColumn("query_norm", F.when(host != "", query_norm))
        .withColumn("url_norm", url_norm)
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    """URL-level exact dedup on the NORMALIZED form: adds the
    ``url_components`` columns plus a 0/1 ``url_keep`` — 1 on the
    lowest-``id`` row of each ``url_norm`` group and on every unparseable
    (NULL ``url_norm``) row.

    Scale shape: ONE groupBy on ``url_norm`` with a ``min(id)`` aggregate
    (map-side combined) joined back — the census-join form, never a
    row_number window that would buffer a hot URL's occurrences in one
    partition."""
    parts = url_components(df, url_col)
    keeper = parts.where(F.col("url_norm").isNotNull()).groupBy(
        "url_norm"
    ).agg(F.min(id_col).alias("__keep_id"))
    return (
        parts.join(keeper, "url_norm", "left")
        .withColumn(
            "url_keep",
            F.when(
                F.col("url_norm").isNull()
                | (F.col(id_col) == F.col("__keep_id")),
                1,
            ).otherwise(0),
        )
        .drop("__keep_id")
    )


def longest_prefix_match(
    df: DataFrame,
    rules: DataFrame,
    id_col: str,
    key_col: str,
    prefix_col: str = "prefix",
    how: str = "left",
) -> DataFrame:
    """Match each row to the MOST SPECIFIC rule whose prefix starts
    ``key_col`` — URL blocklist/allowlist routing (RefinedWeb stage-1
    URL filtering), CDN/path rule attribution, IP-prefix analogs.
    Returns the input plus the winning rule's columns (renamed
    ``match_<col>``) and ``match_len`` (null when unmatched;
    ``how='inner'`` drops unmatched rows).

    Scale shape: a ``startswith`` theta-join would plan as a
    BroadcastNestedLoopJoin (O(rows·rules) comparisons). Instead each
    key explodes into one truncation per DISTINCT rule-prefix LENGTH
    (collected to the driver — bounded by max prefix length, NOT by
    rule count, the kmeans_step discipline) and the join is EQUI on the
    truncated key — broadcastable for config-sized rule sets, plain
    hash join for million-rule blocklists. At a given length the
    truncation is a single string, so at most one rule per length
    matches: the per-row winner is ONE max(struct(len, ...)) aggregate
    with no tie ambiguity."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left or inner, got {how!r}")
    lengths = sorted({
        r[0] for r in rules.select(
            F.length(F.col(prefix_col))).distinct().collect()
        if r[0] and r[0] > 0})
    if not lengths:
        raise ValueError("rules have no non-empty prefixes")
    payload = [c for c in rules.columns if c != prefix_col]
    key = F.col(key_col)
    # distinct-ify: truncations past len(key) all equal the key itself
    cands = F.array_distinct(F.array(*[
        F.substring(key, 1, int(ln)) for ln in lengths]))
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(cands).alias("__cand"))
    r = rules.select(
        F.col(prefix_col).alias("__cand"),
        F.length(F.col(prefix_col)).alias("__len"),
        *[F.col(c) for c in payload])
    hit = (exploded.join(r, "__cand")
           .groupBy("__id")
           .agg(F.max(F.struct(
               F.col("__len"), F.col("__cand").alias("__p"),
               *[F.col(c) for c in payload])).alias("__w")))
    out = df.join(
        hit.select(
            F.col("__id").alias(id_col),
            F.col("__w.__len").alias("match_len"),
            F.col("__w.__p").alias("match_prefix"),
            *[F.col(f"__w.{c}").alias(f"match_{c}") for c in payload]),
        id_col, how)
    return out


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-registered-domain corpus profile: page count, distinct
    normalized URLs, and (optionally) a mean of ``size_col`` — the
    inputs to RefinedWeb-style domain blocklisting and per-domain caps.

    ``exact_distinct=False`` flips COUNT(DISTINCT) to
    ``approx_count_distinct`` (HLL) — at 10^12 pages the exact form's
    per-domain distinct shuffle is the bottleneck and ±2% suffices for
    blocklist decisions; the exact form stays the oracle path."""
    parts = url_components(df, url_col).where(F.col("domain").isNotNull())
    distinct_urls = (
        F.count_distinct("url_norm")
        if exact_distinct
        else F.approx_count_distinct("url_norm")
    )
    aggs = [
        F.count("*").alias("n_pages"),
        distinct_urls.alias("n_urls"),
    ]
    if size_col is not None:
        aggs.append(F.avg(size_col).alias("mean_size"))
    return parts.groupBy("domain").agg(*aggs)
