"""URL identity columns: canonical form, 64-bit key, host, registered domain.

``url_hash = xxhash64(canonical_url)`` (JVM built-in, the north rule's seen-set
key). Canonicalization itself is the crawlee-uniqueKey-parity Python function
(functions/urlnorm.py) over Arrow batches; everything downstream of the
canonical string is built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize_url_udf, registered_domain_udf


def url_hash_col(canonical: Column | str) -> Column:
    """xxhash64 of the canonical URL — the dedup/bucketing key everywhere."""
    return F.xxhash64(canonical)


def with_url_identity(
    df: DataFrame,
    url_col: str = "url",
    drop_invalid: bool = True,
) -> DataFrame:
    """Add ``canonical_url``, ``url_hash``, ``host`` columns.

    ``host`` is the registered domain (politeness granularity per the north
    rule). Unparseable URLs (canonical_url null — normalizeUrl's null return)
    are dropped when ``drop_invalid``, matching the reference's silent skip
    of malformed hrefs.
    """
    out = (
        df.withColumn("canonical_url", canonicalize_url_udf(F.col(url_col)))
        .withColumn("url_hash", url_hash_col(F.col("canonical_url")))
        .withColumn("host", registered_domain_udf(F.col(url_col)))
    )
    if drop_invalid:
        out = out.filter(F.col("canonical_url").isNotNull())
    return out


def bucket_col(url_hash: Column | str, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) — the storage-partitioning key for
    ``frontier``/``url_seen`` co-location (shuffle-free anti-join at scale)."""
    return F.pmod(F.col(url_hash) if isinstance(url_hash, str) else url_hash,
                  F.lit(n_buckets)).cast("int")
