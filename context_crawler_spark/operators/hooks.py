"""Per-page visit hooks — the reference's UDTF extension surface.

The reference's only user extension point is ``onVisitPage``: an arbitrary
async function receiving ``{page, pushData}`` per visited page
(reference src/schema.ts:18-21,97; invoked src/core.ts:197-199). It can
inspect the page and PUSH EXTRA ROWS into the crawled dataset — i.e. a
per-row table function.

Spark mapping (SURVEY.md §2.9): an optional ``mapInPandas`` stage over the
fetched batch. The hook is a plain Python function

    hook(row: dict) -> list[dict]

receiving one page row (url, title, text, html…) and returning zero or
more EXTRA output rows (dicts matching ``extra_schema``). The page rows
themselves always pass through unchanged; hook outputs land in a separate
``hook_out`` table so the main pages contract stays stable. Arrow-batched:
the hook runs per row but inside the batch loop — the contract mirrors the
reference exactly (its hook is per-page too), and hooks are opt-in, off
the default hot path.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def apply_visit_hook(
    fetched: DataFrame,
    hook: Callable[[dict], list[dict]],
    extra_schema: str,
) -> DataFrame:
    """Run ``hook`` over every fetched page; returns the extra rows as a
    DataFrame with ``extra_schema`` (pushData analog)."""
    cols = fetched.columns
    field_names = [
        f.strip().split()[0].strip("`")
        for f in extra_schema.split(",")
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.to_dict("records"):
                out.extend(hook(row) or [])
            yield pd.DataFrame(out, columns=field_names)

    return fetched.mapInPandas(run, extra_schema)


def apply_visit_hook_batched(
    fetched: DataFrame,
    batch_hook: Callable[[pd.DataFrame], pd.DataFrame],
    extra_schema: str,
) -> DataFrame:
    """Vectorized escape hatch for :func:`apply_visit_hook` (r6, guide §4.2
    / VERDICT r5 #5): same output-table contract, but the hook receives the
    WHOLE Arrow batch as one pandas DataFrame and returns a DataFrame of
    extra rows (any row count, columns matching ``extra_schema``). A hook
    expressible as pandas/NumPy column ops skips the per-row dict
    construction and per-row Python call of the row-at-a-time form —
    measured 1.4-1.6x end-to-end on trivial column-arithmetic hooks
    (where the Arrow transfer dominates both paths;
    bench_logs/hook_batched_r06.json) and growing with per-row hook
    cost, since the per-row Python call is what it removes.
    Row-at-a-time remains the default because it mirrors the
    reference's per-page ``onVisitPage`` contract exactly."""
    field_names = [
        f.strip().split()[0].strip("`")
        for f in extra_schema.split(",")
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = batch_hook(pdf)
            if out is None or len(out) == 0:
                yield pd.DataFrame(columns=field_names)
            else:
                yield out[field_names] if list(out.columns) != field_names \
                    else out

    return fetched.mapInPandas(run, extra_schema)
