"""Structured Streaming variants of the engine's stages (SURVEY.md §2.7).

The primary engine is batch BSP (crawl rounds are barrier-synchronous), but
a continuously-fed corpus wants streaming ingest: these pipelines are the
documented escape hatch — file-source ``readStream`` with
``Trigger.AvailableNow`` per round, watermarked event-time windows for late
data, and ``applyInPandasWithState`` for custom stateful operators.
"""
