"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the flagship extraction (feature-vectors over documents) + the
north-rule temporal core (as-of join, sessionize, ffill) + representative
relational queries. ``value`` = total wall seconds; per-query seconds under
"queries"; extraction throughput reported as "fv_per_sec".

Scaling evidence (BASELINE.md row 8): SPARK_GRAFT_SCALING=1 runs the
extraction at two parallelism levels (8 and 32 cores) and adds
"scaling": {"cores_lo", "tput_lo", "cores_hi", "tput_hi", "efficiency"}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _count(df) -> int:
    return df.count()


def _run_extraction(spark, sf_dir: str) -> tuple:
    """Flagship: full 93-feature extraction over documents. Returns
    (rows, seconds)."""
    import __spark_entry__ as e

    t0 = time.time()
    from pyradiomics_spark.config import ExtractionSettings
    from pyradiomics_spark.operators.features import extract_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract_features(docs, keys=("doc_id",), text_col="text",
                           settings=ExtractionSettings(bin_width=1.0))
    n = _count(out)
    return n, time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from pyradiomics_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark(app_name="bench", cores=cpus)
    timings: dict = {}

    # flagship extraction
    n_fv, secs = _run_extraction(spark, sf_dir)
    timings["feature_extraction"] = round(secs, 3)
    fv_per_sec = n_fv / secs if secs > 0 else 0.0

    # headline operator queries
    qs = e.queries()
    headline = [
        "asof_join", "sessionize", "ffill", "lag_lead",
        "glcm_pairs", "glrlm_runs", "fo_doc_stats",
        "tpch_q1", "top_customers", "dedup_exact", "text_quality",
    ]
    for name in headline:
        if name not in qs:
            continue
        t0 = time.time()
        _count(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "headline query wall-clock (flagship extraction + temporal + relational) at sf",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "fv_rows": n_fv,
        "fv_per_sec": round(fv_per_sec, 1),
        "cores": cpus,
    }

    if os.environ.get("SPARK_GRAFT_SCALING"):
        spark.stop()
        scaling = {}
        for label, c in (("lo", 8), ("hi", 32)):
            s = get_spark(app_name=f"bench-scaling-{c}", cores=c)
            n, secs = _run_extraction(s, sf_dir)
            scaling[f"cores_{label}"] = c
            scaling[f"tput_{label}"] = round(n / secs, 1)
            s.stop()
        ratio = scaling["tput_hi"] / scaling["tput_lo"] if scaling["tput_lo"] else 0
        scaling["efficiency"] = round(ratio / (32 / 8), 3)
        result["scaling"] = scaling
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
