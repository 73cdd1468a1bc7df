"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline carries images/audio/video as ``binary`` columns
with struct metadata, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing here (schemas, batch shapes, partition sizing,
UDF signatures) is real and tested; the codec calls themselves are STUBBED
(this container has no image/audio libraries): ``decode_image`` tries
Pillow and otherwise falls back to a clearly-marked deterministic fake
decoder so the pipeline shape is exercisable end to end.

Scale notes baked into the design:
  * payloads never pass through Python row-at-a-time — one Arrow batch in,
    one out; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory
  * feature extraction emits SMALL typed columns (dims, hashes, features) —
    the binary column is dropped as early as the plan allows so downstream
    shuffles move kilobytes, not payloads
  * ``repartition_for_payloads`` sizes partitions by BYTES not rows (binary
    columns defeat Spark's row-count heuristics)
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "width int, height int, channels int, format string, sha256 string"
)

try:  # pragma: no cover - optional dependency
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in decoder: derives (w, h, c, format) from the
    payload hash. NOT a real decode — replace with Pillow/ffmpeg on a
    cluster. Marked fake so tests exercising the plumbing can't be mistaken
    for codec coverage."""
    h = hashlib.sha256(payload).digest()
    w = 64 + _struct.unpack("<H", h[0:2])[0] % 1984
    hh = 64 + _struct.unpack("<H", h[2:4])[0] % 1984
    return w, hh, 3, "fake"


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload → typed image metadata struct. Real decode with
    Pillow when available; deterministic fake otherwise."""
    cols = [c for c in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                if _HAVE_PIL and b[:2] in (b"\xff\xd8", b"\x89P"):
                    from PIL import Image as _I

                    try:
                        with _I.open(io.BytesIO(b)) as im:
                            metas.append(
                                (im.width, im.height, len(im.getbands()),
                                 (im.format or "?").lower())
                            )
                            continue
                    except Exception:
                        pass
                metas.append(_fake_decode(b))
            out = pdf.copy()
            out["width"] = [m[0] for m in metas]
            out["height"] = [m[1] for m in metas]
            out["channels"] = [m[2] for m in metas]
            out["format"] = [m[3] for m in metas]
            out["sha256"] = [
                hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                for p in pdf[payload_col]
            ]
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + IMAGE_META_SCHEMA
    return df.mapInPandas(run, schema)


def image_features(df: DataFrame, payload_col: str = "payload",
                   dim: int = 64) -> DataFrame:
    """payload → unit-norm feature vector (deterministic byte-histogram
    projection — the stand-in for a vision encoder; same column contract:
    ``array<float>`` unit vectors). Drops the payload column in the SAME
    stage so only features shuffle downstream."""
    keep = [c for c in df.columns if c != payload_col]
    rng = np.random.RandomState(4242)
    proj = rng.standard_normal((256, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                b = np.frombuffer(bytes(payload) if payload is not None else b"\0",
                                  dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                v = hist @ proj
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32).tolist())
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != payload_col
    ) + ", features array<float>"
    return df.mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30,
                      ts_col: str = "n_frames") -> DataFrame:
    """Video frame-sampling PLAN: expand (asset, n_frames) → one row per
    sampled frame index via built-in ``sequence`` + ``explode`` — the
    expansion is JVM-side; the actual frame decode would be the mapInPandas
    stage that consumes this plan (stubbed: no ffmpeg in-container)."""
    return df.withColumn(
        "frame_ix",
        F.explode(F.sequence(F.lit(0), F.col(ts_col) - 1, F.lit(every_n))),
    )


def repartition_for_payloads(df: DataFrame, total_bytes: int,
                             target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Partition-by-bytes: binary payloads make row counts meaningless;
    size tasks so one partition ≈ target bytes (Spark's
    files.maxPartitionBytes analog for in-flight data)."""
    n = max(1, int(total_bytes / target_partition_bytes))
    return df.repartition(n)
