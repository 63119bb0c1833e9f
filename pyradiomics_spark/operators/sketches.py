"""Count-min sketch — fixed-size mergeable frequency summaries.

The monitoring half of a web-scale pipeline (which tokens/domains/URLs
are exploding this crawl?) cannot afford a full census per window; a
count-min sketch (Cormode & Muthukrishnan 2005) bounds the state at
depth×width cells with a one-sided error guarantee (estimates only ever
OVERcount, by ≤ εN with ε = e/width at the usual depth = ⌈ln 1/δ⌉).

Spark-first shape: the sketch IS a tiny DataFrame (depth·width rows) —
built with one explode + ONE map-side-combined groupBy, so each
partition ships at most depth·width partial cells no matter how many
rows it scanned; sketches from different days/shards union+sum to merge
(the mergeability is the point at 100 TB). Hashing is the engine-wide
md5 family, so a DuckDB oracle replays the sketch bit-for-bit —
deterministic, unlike seeded-at-random sketch libraries.

Reference scope note: pyradiomics has no sketch stage; LLM-pipeline
surface alongside quantile_buckets' GK arm (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(col, d: int, width: int, seed: int) -> Column:
    """Row d's cell for a value: first 8 md5 hex digits of
    ``value ':' seed+d`` mod width — same derivation family as
    sampling.hash_fraction, engine-reproducible."""
    h = F.md5(F.concat(col.cast("string"), F.lit(f":{seed + d}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(int(width)))


def cms_sketch(
    df: DataFrame,
    col,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Build the sketch: rows ``(d, cell, cnt)`` with
    ``cnt = #values hashing to cell under row d's hash``. Null values
    are not counted. Union+``groupBy(d, cell).sum`` merges sketches.

    One explode (×depth) + one partial-aggregated groupBy — the shuffle
    carries ≤ depth·width rows per partition, independent of corpus
    size."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    c = F.col(col) if isinstance(col, str) else col
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"), _cell(c, d, width, seed).alias("cell"))
        for d in range(depth)
    ])
    return (
        df.where(c.isNotNull())
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: the estimate is
    ``min over d of sketch[d, h_d(item)]`` (0 if a cell is empty —
    value never seen). One-sided: ``estimate >= true count`` always.

    Scale shape: items explode ×depth and equi-join the sketch —
    the sketch side is ≤ depth·width rows, so AQE broadcasts it and the
    query is one scan of items. width/depth/seed MUST match the build
    (they parameterize the hash — a mismatch silently queries garbage,
    so they are explicit arguments, not inferred)."""
    c = F.col(item_col)
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"), _cell(c, d, width, seed).alias("cell"))
        for d in range(depth)
    ])
    exploded = items.select(c, F.explode(pairs).alias("p")).select(
        item_col, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    return (
        exploded.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def hll_registers(
    df: DataFrame,
    col,
    p: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Deterministic HyperLogLog register table: rows ``(bucket, rho)``
    for the 2^p observed buckets, ``rho`` = max over the bucket's values
    of (leading zeros of the 50-bit hash suffix + 1). Unlike
    ``approx_count_distinct`` (whose sketch is engine-internal), the
    hash is the repo's md5 family — two engines, or two runs of two
    different clusters, build THE SAME registers, so sketch state can be
    checkpointed, diffed, and oracle-verified. Merge = union +
    ``groupBy(bucket).max(rho)``; fixed ≤ 2^p rows of state.

    Bit layout: 60-bit hash (15 md5 hex chars — stays positive in an
    int64 in every engine), top ``p`` bits = bucket, low ``60−p`` bits =
    suffix; rho via EXACT integer bit-length (``length(bin(w))``), never
    floating log2 (which misrounds at powers of two).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(f":{seed}"))),
                    1, 15), 16, 10).cast("long")
    suffix_bits = 60 - p
    # bit shifts, NOT `/` (double division — loses bits above 2^53 and
    # can flip a bucket near a power-of-two boundary)
    bucket = F.shiftright(h, suffix_bits)
    w = h.bitwiseAND(F.lit(2 ** suffix_bits - 1))
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(w)))
    return (
        df.where(c.isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 10):
    """Cardinality estimate from a register table (driver-side, O(2^p)):
    the standard HLL harmonic mean with the small-range linear-counting
    correction. Returns ``(estimate: float, nonzero_buckets: int)``."""
    import math

    m = 2 ** p
    rows = registers.collect()
    nonzero = len(rows)
    inv = float(m - nonzero) + sum(2.0 ** -r["rho"] for r in rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / inv
    zeros = m - nonzero
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est, nonzero


def hll_by_group(
    df: DataFrame,
    group_cols,
    col,
    p: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Per-group HLL distinct estimate, FULLY distributed — the grouped
    companion to ``hll_registers``/``hll_estimate`` (whose finalize is a
    driver call): register build is one groupBy (group, bucket) max,
    the harmonic estimate + linear-counting correction evaluate as
    expressions in a second per-group aggregate — ≤ 2^p rows per group
    ever shuffle, no collect, no Python. Output (group..., est,
    nonzero_buckets).

    The 2^-rho terms are computed as ``1.0 / (1 << rho)`` — exact
    powers of two in any IEEE engine — never ``pow(2.0, -rho)``, so the
    oracle replays the estimate to rounding-gate precision."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(f":{seed}"))),
                    1, 15), 16, 10).cast("long")
    suffix_bits = 60 - p
    bucket = F.shiftright(h, suffix_bits)
    w = h.bitwiseAND(F.lit(2 ** suffix_bits - 1))
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(w)))
    regs = (
        df.where(c.isNotNull())
        .select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho")))
    m = 2 ** p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = (F.lit(float(m)) - F.count("*")
           + F.sum(F.lit(1.0)
                   / F.expr("shiftleft(CAST(1 AS BIGINT), rho)")))
    raw = F.lit(alpha * m * m) / inv
    zeros = F.lit(float(m)) - F.count("*")
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                 ).otherwise(raw)
    return regs.groupBy(*groups).agg(
        est.alias("est"),
        F.count("*").alias("nonzero_buckets"))


def bloom_build(
    df: DataFrame,
    col,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bloom filter as a DataFrame of SET bit positions
    ``(bit,)`` — the at-scale membership structure for decontamination
    (is this train doc's hash in the eval set?) and URL seen-lists. The
    md5 hash family makes the filter value-deterministic: build it
    twice, on two clusters or two engines, and the SAME bits are set
    (so filters are checkpointable and diffable, unlike
    ``DataFrame.stat.bloomFilter``'s opaque binary).

    Build = explode ×n_hashes + distinct — shuffle bounded by n_bits
    rows total, map-side combined. Merge = union + distinct. Size the
    filter as n_bits ≈ 1.44·n·log2(1/fpr), n_hashes ≈ 0.693·n_bits/n.
    """
    if n_bits < 2 or n_hashes < 1:
        raise ValueError("n_bits must be >= 2 and n_hashes >= 1")
    c = F.col(col) if isinstance(col, str) else col
    bits = F.array(*[
        _cell(c, d, n_bits, seed).alias(f"b{d}") for d in range(n_hashes)
    ])
    return (
        df.where(c.isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_contains(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 0,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Membership test: true iff ALL n_hashes bits are set — one-sided
    (false positives at the designed rate, never false negatives), so a
    negative is a PROOF of absence: filtering train docs on
    ``~maybe_member`` can never drop a clean doc's contamination flag.

    Scale shape: items explode ×n_hashes, LEFT join the bit table
    (≤ n_bits rows — broadcast), count hits per item, compare to
    n_hashes. One scan of items; parameters must match the build (they
    define the hash family — explicit, never inferred)."""
    c = F.col(item_col)
    bits = F.array(*[
        _cell(c, d, n_bits, seed) for d in range(n_hashes)
    ])
    exploded = items.select(c, F.explode(bits).alias("bit"))
    marked = bloom.withColumn("__set", F.lit(1))
    return (
        exploded.join(F.broadcast(marked), "bit", "left")
        .groupBy(item_col)
        # count found vs count probed (not the literal n_hashes) so a
        # duplicated item row still answers correctly
        .agg((F.count(F.col("__set")) == F.count(F.lit(1))).alias(out_col))
    )


def kmv_sketch(
    df: DataFrame,
    group_cols,
    col,
    k: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct sketch (Bar-Yossef et
    al. RANDOM'02; Beyer et al. SIGMOD'07): the ``k`` smallest DISTINCT
    60-bit md5 hashes of ``col`` — rows ``(group..., pos, h)`` with
    ``pos`` = 1-based rank. Next to HLL this sketch trades a few KB of
    state for two things web-scale curation wants: an UNBIASED
    estimator and closure under set operations (the k smallest of a
    union are a subset of the two sketches' union, so sketches from
    different crawls merge exactly: union + re-rank; intersections give
    Jaccard overlap of host vocabularies without touching corpus rows).

    Deterministic: the engine-wide md5 family (same 60-bit layout as
    ``hll_registers``) — two engines build THE SAME sketch, so state
    checkpoints, diffs, and oracle-verifies.

    Scale shape: ONE map-side-combined distinct on (group, h) — each
    scan partition ships at most its distinct hashes — then a rank
    window partitioned by group over the distinct rows (one exchange +
    in-partition sort; never corpus rows). At 100 TB run it per shard
    and merge with ``kmv_merge``."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(f":{seed}"))),
                    1, 15), 16, 10).cast("long")
    dist = (df.where(c.isNotNull())
            .select(*groups, h.alias("h")).distinct())
    w = Window.partitionBy(*groups).orderBy("h")
    return (dist.withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= k)
            .select(*groups, "pos", "h"))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols, k: int = 64
              ) -> DataFrame:
    """Exact merge of two KMV sketches over the same key space: union,
    drop duplicate hashes (the same value hashes identically in both),
    keep the k smallest per group. The result is bit-identical to
    sketching the concatenated inputs — the property that makes KMV the
    cross-crawl distinct-counting currency."""
    from pyspark.sql import Window

    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    u = (a.select(*groups, "h").unionByName(b.select(*groups, "h"))
         .distinct())
    w = Window.partitionBy(*groups).orderBy("h")
    return (u.withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= k)
            .select(*groups, "pos", "h"))


def kmv_estimate(sketch: DataFrame, group_cols, k: int = 64) -> DataFrame:
    """(group..., n_hashes, est) from a KMV sketch: exact count when the
    group holds fewer than ``k`` distinct hashes (the sketch IS the
    distinct set), else the unbiased (k−1)/U(k) estimator with U(k) =
    k-th smallest hash normalized to (0,1) by 2^60 (exactly
    representable — the normalization is one exact IEEE division, so an
    oracle replays the estimate through the same fixed op tree). One
    aggregate over ≤ k rows per group."""
    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    agg = sketch.groupBy(*groups).agg(
        F.count("*").alias("n_hashes"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("__hk"))
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("__hk").cast("double") / F.lit(float(1 << 60))))
    return agg.select(*groups, "n_hashes", est.alias("est"))


def kmv_jaccard(a: DataFrame, b: DataFrame, group_cols, k: int = 64
                ) -> DataFrame:
    """Per-group Jaccard similarity estimate between two KMV sketches
    (Beyer et al. SIGMOD'07 §4): over the k smallest hashes of the
    UNION (the merged sketch), count how many belong to both inputs —
    ``j_est = |merged ∩ a ∩ b| / k_used`` with ``k_used = min(k,
    |union sketch|)`` (exact when the union has < k distinct hashes).
    This is the set-operation payoff HLL registers cannot give:
    cross-crawl vocabulary overlap, host-content similarity, split
    leakage screens — straight from checkpointed sketch state, never
    corpus rows.

    Scale shape: a full-outer join of the two ≤k-row-per-group
    sketches + one bounded rank window + one ≤k-row aggregate."""
    from pyspark.sql import Window

    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    sa = a.select(*groups, "h").withColumn("__ina", F.lit(1))
    sb = b.select(*groups, "h").withColumn("__inb", F.lit(1))
    u = (sa.join(sb, [*groups, "h"], "full_outer")
         .select(*groups, "h",
                 F.coalesce(F.col("__ina"), F.lit(0)).alias("__ina"),
                 F.coalesce(F.col("__inb"), F.lit(0)).alias("__inb")))
    w = Window.partitionBy(*groups).orderBy("h")
    topk = (u.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k))
    agg = topk.groupBy(*groups).agg(
        F.count("*").alias("k_used"),
        F.sum(F.col("__ina") * F.col("__inb")).alias("__both"))
    return agg.select(
        *groups, F.col("k_used").cast("long").alias("k_used"),
        (F.col("__both").cast("double")
         / F.col("k_used").cast("double")).alias("j_est"))
