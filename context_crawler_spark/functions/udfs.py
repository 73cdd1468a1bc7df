"""Vectorized pandas/Arrow UDFs — the ONLY Python that touches row data.

Per the engine contract (BASELINE.json input_hint: "vectorized pandas/Arrow
UDFs (no per-row Python) throughout"), every Python computation over column
data goes through these Arrow-batched UDFs. Scheduling-path expressions
(hashing, glob filters, ordering, budgets) stay JVM-side via built-in
``pyspark.sql.functions`` — see operators/*.

Each UDF wraps a pure function from ``functions/`` so unit tests cover the
semantics without a SparkSession and the UDF layer stays trivial glue.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import chunker, extract, textstats, tokens, urlnorm


def _as_str(html) -> str:
    """html column is binary per input_hint; accept str or bytes."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", "replace")
    return html


# -- URL canonicalization ----------------------------------------------------

@F.pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.canonicalize_url(u) if u is not None else None)


@F.pandas_udf(StringType())
def url_host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: urlnorm.url_host(u) if u is not None else None)


import re as _re

# scheme '://' netloc — anchored twin of urlsplit's absolute-URL fast path;
# rows it matches get vectorized host extraction, everything else falls back
# to the exact per-row urlsplit path below
_SCHEME_NETLOC_RE = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")


@F.pandas_udf(StringType())
def registered_domain_udf(urls: pd.Series) -> pd.Series:
    """registered_domain(url_host(url)) — guide-§4.2 vectorized (r6).

    The old ``urls.map(urlsplit → host → PSL)`` parsed every URL with
    row-at-a-time Python — the whole cost of the host-graph reduction
    (2 parses per edge). Now the common ``scheme://netloc...`` shape is
    handled by pandas C-level string ops (one anchored regex extract +
    userinfo/port cleanup), the PSL election runs once per DISTINCT host
    (hosts repeat massively in link graphs), and only rows the fast
    regex cannot prove equivalent (no ``scheme://`` prefix after
    whitespace strip, e.g. relative or control-char-prefixed inputs)
    fall back to the exact urlsplit path. Output is identical: the
    regex netloc equals urlsplit's netloc whenever it matches (both
    take everything between '://' and the first '/?#'; tab/CR/LF are
    stripped first exactly as urlsplit does), and the host cleanup
    mirrors ``urlnorm.url_host`` op for op."""
    def slow(u):
        h = urlnorm.url_host(u) if u is not None else None
        return urlnorm.registered_domain(h) if h else None

    s = urls.str.strip().str.replace(r"[\t\r\n]", "", regex=True)
    netloc = s.str.extract(_SCHEME_NETLOC_RE, expand=False)
    fast = netloc.notna()
    # userinfo: keep everything after the LAST '@' (rsplit('@', 1)[-1])
    host = netloc[fast].str.replace(r"^.*@", "", regex=True)
    # port: '[v6]:port' keeps up to ']'; 'h:port' keeps up to ':'
    bracket = host.str.startswith("[")
    host = host.mask(bracket, host.str.split("]", n=1).str[0] + "]")
    host = host.mask(~bracket, host.str.split(":", n=1).str[0])
    host = host.str.lower()
    uniq = {h: urlnorm.registered_domain(h) if h else None
            for h in host.unique()}
    out = pd.Series(index=urls.index, dtype=object)
    out[fast] = host.map(uniq)
    if (~fast).any():
        out[~fast] = urls[~fast].map(slow)
    return out


# -- Extraction (the byte-identical parity surface) ---------------------------

def make_extract_text_udf(selector: str):
    """Extraction UDF for a plan-time-constant selector (reference
    getPageHtml, src/core.ts:32-51). Selector is captured in the closure so
    the hot loop is a plain map over the Arrow batch."""

    @F.pandas_udf(StringType())
    def extract_text_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda h: extract.extract_text(_as_str(h), selector))

    return extract_text_udf


@F.pandas_udf(StringType())
def extract_text2_udf(html: pd.Series, selector: pd.Series) -> pd.Series:
    """Two-arg variant for per-row selectors (multi-job batches)."""
    return pd.Series(
        [extract.extract_text(_as_str(h), s or "body") for h, s in zip(html, selector)]
    )


@F.pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: extract.extract_title(_as_str(h)))


LINK_TYPE = ArrayType(
    StructType(
        [
            StructField("href", StringType(), False),
            StructField("link_index", IntegerType(), False),
            StructField("is_nav", BooleanType(), False),
        ]
    )
)


PAGE_TYPE = StructType(
    [
        StructField("title", StringType(), False),
        StructField("text", StringType(), False),
        StructField("links", LINK_TYPE, False),
        StructField("n_tokens", IntegerType(), False),
        # meta-robots directive list ("noindex,nofollow"); populated only
        # when the maker is built with robots=True — a null column
        # otherwise, so the struct schema (and every cached plan) is
        # identical either way
        StructField("robots", StringType(), True),
        # <link rel=canonical> target (RFC 6596, resolved absolute) —
        # populated only when built with canonical=True (the scheduler's
        # honor_canonical); null column otherwise, same schema either way
        StructField("canonical", StringType(), True),
    ]
)


def make_extract_page_udf(selector: str, robots: bool = False,
                          canonical: bool = False):
    """Fused fetch-stage extraction: (title, text, links, n_tokens[,
    robots][, canonical]) from ONE DOM parse and ONE Python round-trip per
    page. Separate UDFs would re-parse the DOM and, worse, pipe the full
    text column JVM→Python→JVM once per UDF — Arrow serialization of page
    text is a first-order cost at fetch-stage scale. ``robots=True``
    additionally extracts the <meta name=robots> directive list,
    ``canonical=True`` the resolved <link rel=canonical> hint (each one
    extra head scan, only when the corresponding scheduler flag is on —
    off, the column is null and the plan is unchanged)."""

    @F.pandas_udf(PAGE_TYPE)
    def extract_page_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
        rows = []
        for h, u in zip(html, base_url):
            s = _as_str(h)
            title, text, links = extract.extract_page(s, u or "", selector)
            meta = extract.extract_meta_robots(s) if robots else None
            canon = extract.extract_canonical(s, u or "") if canonical else None
            rows.append((title, text, links, tokens.count_tokens(text),
                         meta, canon))
        return pd.DataFrame(
            rows,
            columns=["title", "text", "links", "n_tokens", "robots",
                     "canonical"])

    return extract_page_udf


@F.pandas_udf(LINK_TYPE)
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """All anchors in DOM order (reference enqueueLinks, src/core.ts:203-207
    + discoverNavigationUrls scope flag, src/core.ts:87-131)."""
    return pd.Series(
        [
            extract.extract_links(_as_str(h), u or "")
            for h, u in zip(html, base_url)
        ]
    )


# -- Token counting / chunking ------------------------------------------------

@F.pandas_udf(IntegerType())
def count_tokens_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: tokens.count_tokens(t or ""))


def make_chunk_text_udf(
    chunk_size: int = chunker.DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = chunker.DEFAULT_CHUNK_OVERLAP,
):
    """Recursive character splitting with the reference's framing
    (src/llm-service.ts:129-145); size/overlap are plan-time constants like
    the reference's env overrides (src/llm-service.ts:15-17)."""

    @F.pandas_udf(ArrayType(StringType()))
    def chunk_text_udf(title: pd.Series, url: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [
                chunker.split_document(t or "", u or "", x or "",
                                       chunk_size, chunk_overlap)
                for t, u, x in zip(title, url, text)
            ]
        )

    return chunk_text_udf


chunk_text_udf = make_chunk_text_udf()


def make_split_text_udf(
    chunk_size: int = chunker.DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = chunker.DEFAULT_CHUNK_OVERLAP,
):
    """Raw recursive character splitting (no framing) — the oracled
    chunk_split_plan surface."""
    sp = chunker.RecursiveCharacterTextSplitter(chunk_size, chunk_overlap)

    @F.pandas_udf(ArrayType(StringType()))
    def split_text_udf(text: pd.Series) -> pd.Series:
        return text.map(lambda t: sp.split_text(t or ""))

    return split_text_udf


@F.pandas_udf(LongType())
def rolling_fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: tokens.rolling_fingerprint(t or "") & ((1 << 63) - 1))


# -- Text analysis -------------------------------------------------------------

LANG_TYPE = StructType(
    [
        StructField("lang", StringType(), False),
        StructField("lang_score", DoubleType(), False),
    ]
)


@F.pandas_udf(LANG_TYPE)
def detect_language_udf(text: pd.Series) -> pd.DataFrame:
    rows = [textstats.detect_language(t or "") for t in text]
    return pd.DataFrame(rows, columns=["lang", "lang_score"])


@F.pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: textstats.quality_score(t or ""))


@F.pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    # r6: whole-batch kernel — one md5 per DISTINCT feature per batch +
    # reduceat bit voting, bit-identical to the scalar simhash64
    return pd.Series(
        textstats.simhash64_batch(text.tolist()), index=text.index)


def make_minhash_udf(num_perm: int = 128, k: int = 5):
    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        # r6: whole-batch kernel (one concatenated hash stream + one
        # minimum.reduceat per chunk), bit-identical to the scalar form
        sigs = textstats.minhash_signatures_batch(text.tolist(), num_perm, k)
        return pd.Series(list(sigs), index=text.index)

    return minhash_udf


def make_minhash_bands_udf(bands: int = 16):
    @F.pandas_udf(ArrayType(LongType()))
    def bands_udf(sig: pd.Series) -> pd.Series:
        import numpy as np

        # r6: batched band hashing over the stacked signature matrix
        keys = textstats._bandkeys_from_sigs(
            np.stack([np.asarray(s, dtype=np.int64) for s in sig]), bands
        ) if len(sig) else np.empty((0, bands), dtype=np.int64)
        return pd.Series(list(keys), index=sig.index)

    return bands_udf


def make_minhash_bandkeys_udf(num_perm: int = 128, bands: int = 16):
    """Fused text -> LSH band keys in ONE Python pass (r6): the chained
    sig-UDF -> bands-UDF form round-trips every 128-long signature
    through Arrow twice. Marked nondeterministic (guide §4.4) so the
    optimizer cannot push the eval below a caller's repartition into a
    single-split scan task — the failure mode that sank the first fused
    attempt (documented in minhash_candidates). Band keys are
    bit-identical to minhash_bands(minhash_signature(text))."""

    @F.pandas_udf(ArrayType(LongType()))
    def bandkeys_udf(text: pd.Series) -> pd.Series:
        # r6 second pass: whole-batch signature + band kernel
        keys = textstats.minhash_bandkeys_batch(text.tolist(), num_perm, bands)
        return pd.Series(list(keys), index=text.index)

    return bandkeys_udf.asNondeterministic()


def make_simhash_bands_udf(bands: int = 4):
    @F.pandas_udf(ArrayType(LongType()))
    def bands_udf(sig: pd.Series) -> pd.Series:
        return sig.map(lambda s: textstats.simhash_bands(int(s), bands))

    return bands_udf


@F.pandas_udf(DoubleType())
def ngram_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact word-3gram Jaccard between two text columns (verification stage
    after LSH candidate generation)."""
    return pd.Series(
        [
            textstats.jaccard(textstats.word_ngrams(x or ""), textstats.word_ngrams(y or ""))
            for x, y in zip(a, b)
        ]
    )


# -- Embeddings ----------------------------------------------------------------

@F.pandas_udf(ArrayType(FloatType()))
def embed_udf(text: pd.Series) -> pd.Series:
    """Embed a text column (reference src/xenova-embeddings.ts:36-91):
    MiniLM via sentence-transformers/ONNX when $CONTEXT_CRAWLER_EMBED_MODEL
    names an available model (batch 512, mean-pool, L2 normalize), else the
    deterministic stand-in — backend picked once per Python worker
    (functions/embeddings.resolve_encoder), identical array<float>
    unit-vector contract either way."""
    from .embeddings import resolve_encoder

    _, encode = resolve_encoder()
    vecs = encode(text.fillna("").tolist())
    return pd.Series([v.tolist() for v in vecs])


@F.pandas_udf(StringType())
def nfc_normalize_udf(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization, Arrow-batched (vectorized
    ``Series.str.normalize`` — the whole batch normalizes in C, one
    JVM<->Python crossing per batch). Spark SQL has no normalization
    built-in; this is the documented slow-path exception. The DuckDB
    oracle replays it with ``nfc_normalize()`` — both implement
    Unicode TR#15 canonical composition, so outputs are byte-identical."""
    return texts.fillna("").str.normalize("NFC")
