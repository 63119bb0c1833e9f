"""snapshot_diff / diff_summary vs python reference."""

from pyspark.sql import functions as F

from pyradiomics_spark.operators.diff import diff_summary, snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "w")],
        ["k", "c1", "c2"])
    new = spark.createDataFrame(
        [(1, "a", "x"),          # unchanged — omitted
         (2, "B", "y"),          # changed
         (4, None, "w"),         # unchanged (null-safe)
         (5, "e", "v")],         # added
        ["k", "c1", "c2"])
    got = {r.key: r.status for r in
           snapshot_diff(old, new, "k", ["c1", "c2"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_sentinel_not_aliased(spark):
    # (NULL, 'x') must differ from ('x', NULL) and from ('', 'x')
    schema = "k int, c1 string, c2 string"
    old = spark.createDataFrame([(1, None, "x")], schema)
    new = spark.createDataFrame([(1, "x", None)], schema)
    out = snapshot_diff(old, new, "k", ["c1", "c2"]).collect()
    assert len(out) == 1 and out[0].status == "changed"
    old2 = spark.createDataFrame([(1, None, "x")], schema)
    new2 = spark.createDataFrame([(1, "", "x")], schema)
    out2 = snapshot_diff(old2, new2, "k", ["c1", "c2"]).collect()
    assert len(out2) == 1 and out2[0].status == "changed"


def test_diff_summary_counts(spark):
    old = spark.createDataFrame([(i, str(i)) for i in range(10)],
                                ["k", "v"])
    new = spark.createDataFrame(
        [(i, str(i) if i % 3 else "CHANGED") for i in range(2, 12)],
        ["k", "v"])
    d = snapshot_diff(old, new, "k", ["v"])
    got = {r.status: r.n for r in diff_summary(d).collect()}
    # removed: 0,1; added: 10,11; changed: 3,6,9 (i%3==0 within overlap)
    assert got == {"removed": 2, "added": 2, "changed": 3}


def test_snapshot_diff_single_thin_join(spark):
    d = snapshot_diff(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", ["text", "lang"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    # fingerprints are projected BEFORE the join: no text column crosses
    # the exchange
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
