"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema exactly per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Everything is a pure function of the row index (md5-keyed), so the corpus is
reproducible at any scale and can be generated **distributed** (mapInPandas
over ``spark.range``) with no driver-side loop and no RNG state — the same
row index yields the same bytes on any executor. Properties exercised
(FIXTURES.md §1):

* hosts follow a Zipf-ish power law (skew handling must engage);
* each url has 1–12 snapshots at irregular minute–day gaps, with exact-tie
  timestamps across urls;
* ``text`` is the exact expected extraction of ``html`` (pins the
  byte-identical invariant);
* ``lang`` ∈ {en, de, fr, nl, zz}; ``zz`` = unlabeled-mask analog.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pandas as pd

from pyradiomics_spark.functions.text import extract_text

N_HOSTS = 50
_LANGS = ("en", "de", "fr", "nl", "zz")
_WORDS = (
    "data spark web page crawl index token stream batch shuffle join scan "
    "filter window merge sort group host fetch parse render cache store "
    "query plan stage task executor driver partition skew salt bucket "
    "feature vector texture level run zone entropy energy contrast"
).split()
_EPOCH = datetime(2024, 1, 1)


def _h(key: str) -> int:
    """Stable 64-bit hash of a string key (md5 prefix)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:16], 16)


def _host_of(url_idx: int) -> int:
    """Zipf-ish (s≈1.2) host assignment via inverse-CDF on a stable hash."""
    u = (_h(f"host:{url_idx}") % 10**9) / 10**9  # uniform [0,1)
    # inverse power-law: host rank r with weight ∝ 1/(r+1)^1.2 over N_HOSTS
    # precomputed cumulative weights
    return _zipf_rank(u)


_ZIPF_CUM = None


def _zipf_rank(u: float) -> int:
    global _ZIPF_CUM
    if _ZIPF_CUM is None:
        w = [1.0 / (r + 1) ** 1.2 for r in range(N_HOSTS)]
        tot = sum(w)
        acc, cum = 0.0, []
        for x in w:
            acc += x / tot
            cum.append(acc)
        _ZIPF_CUM = cum
    for r, c in enumerate(_ZIPF_CUM):
        if u < c:
            return r
    return N_HOSTS - 1


def n_snapshots(url_idx: int) -> int:
    return 1 + _h(f"snaps:{url_idx}") % 12


def _doc_words(url_idx: int, snap: int, n: int) -> list:
    return [_WORDS[_h(f"w:{url_idx}:{snap}:{i}") % len(_WORDS)] for i in range(n)]


def _render_html(url_idx: int, snap: int) -> bytes:
    n = 30 + _h(f"len:{url_idx}") % 400
    words = _doc_words(url_idx, snap, n)
    body = " ".join(words)
    title = " ".join(words[:4])
    # template exercises: script/style stripping, comments, entities,
    # numeric entities, multilingual chars, nested tags
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body { color: #000; }</style>"
        "<script>var x = '<danger>';</script>"
        "</head><body>"
        "<!-- crawler comment -->"
        f"<h1>{title} &amp; more</h1>"
        f"<p>{body}</p>"
        f"<p>caf&#233; stra&#xDF;e &lt;tag&gt; &quot;q{snap}&quot;</p>"
        "<noscript>enable js</noscript>"
        "</body></html>"
    )
    return html.encode("utf-8")


def page_rows(url_indices) -> pd.DataFrame:
    """All snapshot rows for the given url indices (pure function)."""
    rows = []
    for ui in url_indices:
        ui = int(ui)
        host = _host_of(ui)
        url = f"https://host{host:03d}.example/p{ui}"
        lang = _LANGS[_h(f"lang:{ui}") % len(_LANGS)]
        k = n_snapshots(ui)
        # irregular gaps: minutes to days, deterministic; quantized to whole
        # minutes so exact ties across urls occur
        t = _EPOCH + timedelta(minutes=_h(f"t0:{ui}") % (60 * 24 * 30))
        for s in range(k):
            html = _render_html(ui, s)
            text = extract_text(html)
            rows.append((url, t, html, text, lang))
            gap_min = 5 + _h(f"gap:{ui}:{s}") % (60 * 24 * 3)  # 5min .. 3d
            t = t + timedelta(minutes=gap_min)
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_pdf(n_urls: int = 50) -> pd.DataFrame:
    """Driver-side corpus for unit tests (tiny scale)."""
    return page_rows(range(n_urls))


def pages_df(spark, n_urls: int = 1000, partitions: int | None = None):
    """Distributed corpus: spark.range → mapInPandas, no driver loop.

    Scale-safe: at 10^12 pages this is exactly how a synthetic load test
    would be generated — each task renders its own index range.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    rng = spark.range(0, n_urls, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield page_rows(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)
