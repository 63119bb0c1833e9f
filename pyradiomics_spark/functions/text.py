"""Deterministic HTML→text extraction + tokenization + intensity derivation.

The extraction is the analog of the reference's image loader
(/root/reference/radiomics/featureextractor.py:431-442): it turns the raw
stored representation (html binary) into the dense numeric array the kernels
consume. The north-rule invariant is **byte-identical extracted text per
url** across executors and runs — hence pure-regex, locale-free, library-free
extraction with documented normalization rules:

1. drop <script>/<style>/<noscript> blocks and HTML comments;
2. replace all remaining tags with a single space;
3. decode the named entities &amp; &lt; &gt; &quot; &#39; &nbsp; and
   numeric entities &#NNN; / &#xHH;
4. collapse all whitespace runs to one space; strip ends.

Tokenization: ``whitespace`` (split on the normalized single spaces) or
``bpe_regex`` (GPT-2-style coarse pre-tokenizer: words / numbers /
punctuation runs). Intensity: UTF-8 byte length of the token (default) or a
stable hash bucket (md5-based so any engine can reproduce it).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_SCRIPT_RE = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_NAMED_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&apos;": "'", "&nbsp;": " ",
}
# ONE pattern for named + numeric entities so decoding is a single
# left-to-right pass: '&amp;lt;' decodes to the literal '&lt;' (HTML
# semantics), never double-decodes to '<' the way sequential str.replace
# passes would.
_ENT_RE = re.compile(r"&(?:amp|lt|gt|quot|apos|nbsp|#(?:x[0-9a-fA-F]+|[0-9]+));")
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def _decode_entities(s: str) -> str:
    def _one(m: re.Match) -> str:
        tok = m.group(0)
        named = _NAMED_ENTITIES.get(tok)
        if named is not None:
            return named
        body = tok[2:-1]  # strip '&#' and ';'
        try:
            cp = int(body[1:], 16) if body[0] in "xX" else int(body)
            if 0 < cp < 0x110000:
                return chr(cp)
        except ValueError:
            pass
        return tok

    return _ENT_RE.sub(_one, s)


def extract_text(html: bytes | str) -> str:
    """Deterministic HTML→text (single value). Byte-identical per input."""
    if isinstance(html, (bytes, bytearray)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html or ""
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _decode_entities(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Arrow-batched Series→Series extraction (pandas UDF body)."""
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Add the extracted-text column via an Arrow-vectorized pandas UDF —
    the engine's image-loader stage (featureextractor.py:431-442 analog).
    Deterministic and executor-independent ⇒ byte-identical per url
    (north-rule invariant; pinned by tests/test_text_invariant.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    return df.withColumn(out_col, _extract(html_col))


def tokenize(text: str, tokenizer: str = "whitespace") -> list:
    if not text:
        return []
    if tokenizer == "whitespace":
        return text.split()
    if tokenizer == "bpe_regex":
        return _BPE_RE.findall(text)
    raise ValueError(f"unknown tokenizer {tokenizer}")


def token_intensity(
    tokens: list,
    mode: str = "token_len",
    buckets: int = 64,
) -> np.ndarray:
    """1-D integer intensity sequence — the 'gray-level image' of a document.

    token_len: UTF-8 byte length (deterministic, engine-agnostic).
    hash_bucket: first 8 hex chars of md5 mod buckets, +1 (1-based), md5 so
    DuckDB/any SQL engine can reproduce it for oracle checks.
    """
    if mode == "token_len":
        # isascii fast path: byte length == char length, no encode alloc
        return np.array(
            [len(t) if t.isascii() else len(t.encode("utf-8")) for t in tokens],
            dtype=np.int64)
    if mode == "hash_bucket":
        return np.array(
            [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % buckets + 1
             for t in tokens],
            dtype=np.int64,
        )
    raise ValueError(f"unknown intensity mode {mode}")


def text_to_intensity(
    text: str,
    tokenizer: str = "whitespace",
    mode: str = "token_len",
    buckets: int = 64,
) -> np.ndarray:
    return token_intensity(tokenize(text, tokenizer), mode, buckets)


# ascii whitespace exactly as str.split() sees it: chr(i).isspace() for
# i < 128 → {\t \n \v \f \r \x1c \x1d \x1e \x1f ' '}
_ASCII_WS = np.zeros(256, dtype=bool)
_ASCII_WS[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = True


def batch_text_to_intensity(
    texts,
    tokenizer: str = "whitespace",
    mode: str = "token_len",
    buckets: int = 64,
) -> list:
    """Per-doc intensity arrays for a whole Arrow batch at once.

    Fast path (whitespace tokenizer + token_len): ONE byte-level numpy
    pass over the UTF-8-concatenated batch — whitespace mask → paired
    token start/end runs — instead of a Python len() per token (the decode
    was ~1/3 of kernel wall at ~280 ns/token; this is ~10 numpy ops per
    BATCH). Byte semantics are exact for arbitrary UTF-8: multi-byte
    sequences never contain bytes < 0x80, so the 10 _ASCII_WS bytes always
    mean real ascii whitespace, and the token byte length IS the token_len
    intensity. The one hazard is genuine unicode whitespace (U+0085,
    U+00A0, U+1680, U+2000–200A, U+2028/29/2F, U+205F, U+3000 — separators
    for str.split() that the byte mask can't see): a vectorized scan for
    their UTF-8 lead pairs routes only the (rare) docs containing a
    suspect sequence to the per-doc path — conservatively, since e.g.
    \\xe2\\x80 also prefixes dashes. Other tokenizers/modes fall back
    wholesale. Parity is pinned per-doc in tests/test_text.py.
    """
    if tokenizer != "whitespace" or mode != "token_len":
        return [text_to_intensity(t or "", tokenizer, mode, buckets)
                for t in texts]
    out: list = [None] * len(texts)
    enc = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    starts = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    a = np.frombuffer(b"".join(enc), dtype=np.uint8)
    if a.size == 0:
        empty = np.zeros(0, dtype=np.int64)
        return [empty] * len(texts)
    tok_len, counts, sus_pos = _token_lens_from_bytes(a, starts)
    slow_docs = (set(np.searchsorted(starts, sus_pos, side="right") - 1)
                 if sus_pos.size else ())
    bounds = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=bounds[1:])
    for i in range(len(texts)):
        if i in slow_docs:
            out[i] = text_to_intensity(texts[i] or "")
        else:
            lo = bounds[i]
            out[i] = tok_len[lo:lo + counts[i]]
    return out


def _token_lens_from_bytes(a: np.ndarray, starts: np.ndarray):
    """Core byte-level tokenizer over a concatenated UTF-8 buffer.

    ``a``: uint8 buffer of all docs back-to-back; ``starts``: int64 doc
    byte offsets (size n_docs+1, starts[-1] == a.size). Returns
    (tok_len [int64, all tokens in order], counts [tokens per doc],
    sus_pos [byte positions of possible unicode-whitespace sequences —
    docs containing one need the per-doc python fallback]).
    """
    # unicode-ws suspect scan restricted to multi-byte lead bytes (≥ 0xC2):
    # one full pass + tiny index ops instead of eight full boolean sweeps
    hi_pos = np.nonzero(a >= 0xC2)[0]
    hi_pos = hi_pos[hi_pos < a.size - 1]
    sus_pos = np.empty(0, dtype=np.int64)
    if hi_pos.size:
        lead, nxt = a[hi_pos], a[hi_pos + 1]
        sus = (
            ((lead == 0xC2) & ((nxt == 0x85) | (nxt == 0xA0)))
            | ((lead == 0xE1) & (nxt == 0x9A))
            | ((lead == 0xE2) & ((nxt == 0x80) | (nxt == 0x81)))
            | ((lead == 0xE3) & (nxt == 0x80)))
        sus_pos = hi_pos[sus]
    ws = _ASCII_WS[a]
    nonspace = ~ws
    prev_nonspace = np.empty_like(nonspace)
    prev_nonspace[0] = False
    prev_nonspace[1:] = nonspace[:-1]
    next_nonspace = np.empty_like(nonspace)
    next_nonspace[-1] = False
    next_nonspace[:-1] = nonspace[1:]
    is_doc_start = np.zeros(a.size + 1, dtype=bool)
    is_doc_start[starts[:-1]] = True  # a token never crosses a doc boundary
    tok_start = nonspace & (~prev_nonspace | is_doc_start[:-1])
    tok_end = nonspace & (~next_nonspace | is_doc_start[1:])
    # starts and ends pair 1:1 in position order (runs of nonspace, split
    # at doc boundaries) — token lengths without any per-token search
    s_pos = np.nonzero(tok_start)[0]
    tok_len = np.nonzero(tok_end)[0] - s_pos + 1
    # tokens-per-doc: one searchsorted over the (small) doc-starts array
    counts = np.diff(np.searchsorted(s_pos, starts))
    return tok_len, counts, sus_pos


def arrow_token_lens(text_array):
    """ZERO-COPY decode of a pyarrow string array straight from its Arrow
    buffers (validity, offsets, UTF-8 data) — no python strings are ever
    materialized; the value buffer IS the concatenated corpus the
    byte-level tokenizer wants. Returns (tok_len_concat int64, counts
    int64 per doc) or None when the batch needs the python path (a
    unicode-whitespace suspect sequence is present — rare, and correctness
    beats zero-copy there).

    Null docs decode as empty (0 tokens), matching ``text or ""``.
    """
    import pyarrow as pa

    arr = text_array
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        return None
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    validity, offsets_buf, data_buf = arr.buffers()
    offsets = np.frombuffer(offsets_buf, dtype=off_dtype,
                            count=n + 1, offset=arr.offset * np.dtype(off_dtype).itemsize
                            ).astype(np.int64)
    if data_buf is None:  # all-null column
        return np.empty(0, dtype=np.int64), np.zeros(n, dtype=np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8)
    lo, hi = offsets[0], offsets[-1]
    a = data[lo:hi]
    starts = offsets - lo
    if arr.null_count:
        # rebuild the buffer without the null docs' (undefined) bytes:
        # cheapest correct handling — null rows become zero-length segments
        valid = np.asarray(arr.is_valid(), dtype=bool)
        lens = np.where(valid, np.diff(starts), 0)
        starts2 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=starts2[1:])
        keep = np.ones(a.size, dtype=bool)
        for i in np.nonzero(~valid)[0]:
            keep[starts[i]:starts[i + 1]] = False
        a = a[keep]
        starts = starts2
    if a.size == 0:
        return np.empty(0, dtype=np.int64), np.zeros(n, dtype=np.int64)
    tok_len, counts, sus_pos = _token_lens_from_bytes(a, starts)
    if sus_pos.size:
        return None
    return tok_len, counts
