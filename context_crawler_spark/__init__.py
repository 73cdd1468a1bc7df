"""context_crawler_spark — a PySpark-native bulk web-crawl frontier scheduler.

A from-scratch reimplementation of the query/data-processing capabilities of
``temrb/context-crawler`` (reference read-only at /root/reference) as a
bulk-synchronous-parallel (BSP) frontier scheduler over snapshot-committed
tables, designed for 10^10-URL frontiers on multi-executor clusters and
verified at small scale against a sequential oracle.

Architecture (SURVEY.md §7): each crawl round reads the ``frontier`` table,
filters retry-eligible pending URLs, anti-joins a bucketed URL-seen set
(bloom prefilter + exact anti-join), enforces per-host politeness with
salted windows, emits a priority-ordered fetch batch replicating the
reference's SQLite claim ordering (reference src/queue.ts:131-137) plus
FIFO BFS frontier order, extracts text with vectorized pandas/Arrow UDFs
(byte-identical per url to the pinned extractor), expands links, and
commits the next frontier/seen/host state as one atomic snapshot — the
checkpoint a killed run resumes from.
"""

__version__ = "0.1.0"
