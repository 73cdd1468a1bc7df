"""Output stage: token/byte-budget file splitting + llms.txt emission.

Replicates the reference's ``write()`` (reference src/core.ts:360-477)
exactly, quirks included (pinned from src/core.ts:415-450):

  * per item, contentString = compact JSON of {title,url,html}; its
    UTF-8 byte length ALWAYS accrues to currentSize
  * token budget: if estimatedTokens + tokenCount > maxTokens → flush the
    batch (if non-empty), then ``estimatedTokens = floor(tokenCount/2)``
    (the halving rule, src/core.ts:434) and the item starts the new batch
  * an item whose contentString ALONE exceeds maxTokens is silently dropped
    from the results (isWithinTokenLimit returns false → no push), but its
    bytes still count (src/core.ts:421-441 fall-through)
  * byte budget: currentSize > maxBytes → flush, even to an empty file;
    estimatedTokens is NOT reset by a byte-triggered flush
  * naming: single-batch output keeps the plain name; multi-batch gets
    ``-1.json``, ``-2.json`` … (src/core.ts:394-395,459-470)

Two Spark materializations:
  * ``assign_file_ids_exact`` — applyInPandas per job, sequential semantics,
    byte-identical file boundaries (a job's manifest fits one task: it is
    (tokens, bytes) pairs, not page text)
  * ``assign_buckets_scalable`` — running-sum window bucketing
    (floor(cumsum/budget)); same content, coarser boundary guarantee, fully
    distributed — the 100 TB path where strict boundary parity is waived
"""

from __future__ import annotations

import json
import math
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokens import count_tokens


def content_string(title: str, url: str, text: str) -> str:
    """JS ``JSON.stringify({title, url, html})`` parity (key order as
    constructed at reference src/core.ts:195; ``html`` holds extracted
    text). ensure_ascii=False + compact separators match JS output for the
    BMP text our extractor emits."""
    return json.dumps(
        {"title": title, "url": url, "html": text},
        ensure_ascii=False, separators=(",", ":"),
    )


def split_plan(
    items: list[tuple[int, int]],
    max_tokens: int | None,
    max_bytes: int | None,
) -> list[int]:
    """Per-item file assignment only; see ``split_plan_full``."""
    return split_plan_full(items, max_tokens, max_bytes)[0]


def split_plan_full(
    items: list[tuple[int, int]],
    max_tokens: int | None,
    max_bytes: int | None,
) -> tuple[list[int], int]:
    """The pinned sequential algorithm over per-item (token_count, byte_len).

    Returns (assignment, final_file_counter): one file index (1-based) per
    item, or -1 for dropped items, plus the state machine's final counter —
    needed for naming parity (a byte-flush of an empty batch advances the
    counter without assigning any item to it). Pure function — shared by the
    Spark applyInPandas path and the oracle tests."""
    out: list[int] = []
    batch_nonempty = False
    current_size = 0
    estimated_tokens = 0
    file_counter = 1
    for tok, nbytes in items:
        if max_tokens is not None:
            if tok > max_tokens:
                out.append(-1)  # isWithinTokenLimit → false: silently dropped
            elif estimated_tokens + tok > max_tokens:
                if batch_nonempty:
                    file_counter += 1
                    batch_nonempty = False
                    current_size = 0
                estimated_tokens = math.floor(tok / 2)
                out.append(file_counter)
                batch_nonempty = True
            else:
                out.append(file_counter)
                batch_nonempty = True
                estimated_tokens += tok
        else:
            out.append(file_counter)
            batch_nonempty = True
        current_size += nbytes
        if max_bytes is not None and current_size > max_bytes:
            file_counter += 1  # flush even if empty (reference quirk)
            batch_nonempty = False
            current_size = 0
    return out, file_counter


def finalize_file_names(
    assignment: list[int], base_name: str, final_counter: int | None = None
) -> dict[int, str]:
    """file index → file name, reference naming parity (src/core.ts:394-395,
    459-474): every mid-run flush writes ``-N.json`` — INCLUDING a
    byte-flushed empty batch — and the final batch is written only if
    non-empty, plain-named iff no flush ever happened (final counter == 1).
    Without ``final_counter`` (legacy callers) the max assigned index is
    assumed to be the final counter."""
    used = {i for i in assignment if i > 0}
    last = final_counter if final_counter is not None else max(used, default=1)
    if last == 1:
        return {1: f"{base_name}.json"} if used else {}
    names = {i: f"{base_name}-{i}.json" for i in range(1, last)}
    if last in used:
        names[last] = f"{base_name}-{last}.json"
    return names


def assign_file_ids_exact(
    pages_out: DataFrame,
    max_tokens: int | None,
    max_bytes_mb: int | None,
    job_col: str = "job",
    count_tokens_fn: Callable[[str], int] = count_tokens,
) -> DataFrame:
    """Byte-identical file-boundary assignment: adds ``file_id`` (-1 =
    dropped) per row, sequential per job in visit order (round, fetch_order).

    The per-job state machine runs in ONE task per job via applyInPandas —
    fine even at scale because its input is two ints per page; the page
    text itself only flows through for the content-string measure.
    """
    max_bytes = max_bytes_mb * 1024 * 1024 if max_bytes_mb else None
    cols = pages_out.columns

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["round", "fetch_order"]).reset_index(drop=True)
        sizes = []
        for t, u, x in zip(pdf["title"], pdf["url"], pdf["text"]):
            cs = content_string(t or "", u or "", x or "")
            sizes.append((count_tokens_fn(cs), len(cs.encode("utf-8"))))
        pdf["file_id"] = split_plan(sizes, max_tokens, max_bytes)
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in pages_out.schema.fields) + ", file_id int"
    return pages_out.groupBy(job_col).applyInPandas(run, schema)[[*cols, "file_id"]]


def assign_buckets_scalable(
    pages_out: DataFrame,
    max_tokens: int,
    job_col: str = "job",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Distributed bucketing: ``bucket = floor(running_sum_before/budget)``
    via a window ordered by visit order. Boundaries differ from the
    reference's flush-reset machine by at most one item per file — the
    documented trade for full parallelism at 100 TB."""
    w = (
        Window.partitionBy(job_col)
        .orderBy("round", "fetch_order")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return pages_out.withColumn(
        "bucket", F.floor(run_before / F.lit(max_tokens)).cast("int")
    )


def write_job_json(
    pages_out_pdf: pd.DataFrame,
    output_dir: str,
    job_name: str,
    max_tokens: int | None = None,
    max_bytes_mb: int | None = None,
) -> list[str]:
    """Materialize the reference's output files from a (small, driver-side)
    pandas frame of one job's pages in visit order: JSON arrays of
    ``{title, url, html}`` with 2-space indent (src/core.ts:400), split per
    ``split_plan``, named per ``finalize_file_names``. Returns paths."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    pdf = pages_out_pdf.sort_values(["round", "fetch_order"]).reset_index(drop=True)
    sizes = []
    for t, u, x in zip(pdf["title"], pdf["url"], pdf["text"]):
        cs = content_string(t or "", u or "", x or "")
        sizes.append((count_tokens(cs), len(cs.encode("utf-8"))))
    max_bytes = max_bytes_mb * 1024 * 1024 if max_bytes_mb else None
    assignment, final_counter = split_plan_full(sizes, max_tokens, max_bytes)
    names = finalize_file_names(assignment, job_name, final_counter)
    paths = []
    for fid, fname in names.items():
        rows = [
            {"title": pdf["title"][i], "url": pdf["url"][i], "html": pdf["text"][i]}
            for i, a in enumerate(assignment) if a == fid
        ]
        p = os.path.join(output_dir, fname)
        with open(p, "w", encoding="utf-8") as f:
            json.dump(rows, f, ensure_ascii=False, indent=2)
            # the reference's shipped corpus ends with a final newline
            # (every file under reference output/jobs/) — pinned by
            # test_reference_corpus_roundtrip_byte_identical
            f.write("\n")
        paths.append(p)
    return paths


def aggregate_job_outputs(
    per_config: list[pd.DataFrame],
    output_dir: str,
    job_name: str,
    max_tokens: int | None = None,
    max_bytes_mb: int | None = None,
) -> list[str]:
    """Multi-config job aggregation (reference src/cli.ts:163-230,452-532):
    each config's output concatenated in config order into ONE job output,
    then budget-split/named like a single write. The reference streams temp
    JSON files; here the per-config frames concatenate with a config-index
    prefix on the visit order."""
    frames = []
    for ix, pdf in enumerate(per_config):
        pdf = pdf.sort_values(["round", "fetch_order"]).reset_index(drop=True)
        pdf = pdf.copy()
        pdf["round"] = ix  # config order becomes the primary sort key
        pdf["fetch_order"] = range(len(pdf))
        frames.append(pdf)
    merged = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["title", "url", "text", "round", "fetch_order"]
    )
    return write_job_json(merged, output_dir, job_name, max_tokens, max_bytes_mb)


def llms_txt(pages_out: DataFrame, job_col: str = "job") -> DataFrame:
    """Per-job llms.txt content: ``---\\nTitle: {t}\\nURL: {u}\\n---\\n{text}``
    blocks in visit order, joined with blank lines (reference
    src/llm-service.ts:114-123). Pure built-ins: format_string +
    ordered collect_list + array_join."""
    block = F.format_string("---\nTitle: %s\nURL: %s\n---\n%s",
                            F.col("title"), F.col("url"), F.col("text"))
    w = Window.partitionBy(job_col).orderBy("round", "fetch_order")
    return (
        pages_out.withColumn("__block", block)
        .withColumn("__blocks", F.collect_list("__block").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .groupBy(job_col)
        .agg(F.array_join(F.first("__blocks"), "\n\n").alias("llms_txt"))
    )
