"""Embedding backend selection: real MiniLM when available, stand-in otherwise.

The reference embeds chunks with MiniLM-L6-v2 via @xenova/transformers —
mean-pooled, L2-normalized, 384-d, batched (reference
src/xenova-embeddings.ts:36-91). This sandbox has no model weights or
inference runtime, so ``resolve_encoder`` picks the best available backend
at Python-worker start:

  1. ``sentence-transformers`` (normalize_embeddings=True ≡ the reference's
     mean-pool + L2 pipeline) when importable AND a model is requested via
     the ``CONTEXT_CRAWLER_EMBED_MODEL`` env var or an explicit argument
  2. raw ``onnxruntime`` + ``tokenizers`` with the same mean-pool/normalize
     math, when a local .onnx path is given
  3. the deterministic stand-in (``textstats.fake_embed``) — same contract
     (384-d unit float32 vectors), reproducible, dependency-free

The UDF contract (array<float> unit vectors, Arrow batches of
``EMBED_BATCH``) is identical across backends, so swapping is config-only.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from . import textstats

EMBED_MODEL_ENV = "CONTEXT_CRAWLER_EMBED_MODEL"
EMBED_BATCH = 512  # reference batch size (src/xenova-embeddings.ts:57)
EMBED_DIM = 384


def mean_pool_normalize(token_states: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(batch, seq, dim) last-hidden-states + (batch, seq) attention mask →
    (batch, dim) L2-normalized mean-pooled vectors — the exact math the
    reference runs after the ONNX forward pass."""
    m = mask[..., None].astype(np.float64)
    summed = (token_states * m).sum(axis=1)
    counts = np.clip(m.sum(axis=1), 1e-9, None)
    pooled = summed / counts
    norms = np.linalg.norm(pooled, axis=1, keepdims=True)
    return (pooled / np.clip(norms, 1e-12, None)).astype(np.float32)


def _sentence_transformers_encoder(model_name: str) -> Callable | None:
    try:  # pragma: no cover - runtime absent in sandbox
        from sentence_transformers import SentenceTransformer
    except ImportError:
        return None
    model = SentenceTransformer(model_name)

    def encode(texts: list[str]) -> np.ndarray:  # pragma: no cover
        return np.asarray(
            model.encode(
                texts, batch_size=EMBED_BATCH, normalize_embeddings=True,
                show_progress_bar=False,
            ),
            dtype=np.float32,
        )

    return encode


def make_onnx_encode(sess, tok) -> Callable:
    """The ONNX inference loop, separated from runtime construction so the
    I/O contract (int64 input_ids/attention_mask/token_type_ids feeds, one
    last-hidden-state output, mean-pool + L2 after) is testable with a
    duck-typed fake session — onnxruntime itself isn't in this sandbox.
    ``sess`` needs ``.run(None, feeds) -> [hidden]``; ``tok`` needs
    ``.encode_batch(texts) -> [obj with .ids/.attention_mask]``."""

    def encode(texts: list[str]) -> np.ndarray:
        encs = tok.encode_batch(texts)
        width = max((len(e.ids) for e in encs), default=1) or 1
        ids = np.zeros((len(encs), width), dtype=np.int64)
        mask = np.zeros((len(encs), width), dtype=np.int64)
        for i, e in enumerate(encs):
            ids[i, : len(e.ids)] = e.ids
            mask[i, : len(e.attention_mask)] = e.attention_mask
        (hidden,) = sess.run(
            None, {"input_ids": ids, "attention_mask": mask,
                   "token_type_ids": np.zeros_like(ids)}
        )
        return mean_pool_normalize(np.asarray(hidden), mask)

    return encode


def _onnx_encoder(model_path: str) -> Callable | None:
    try:  # pragma: no cover - runtime absent in sandbox
        import onnxruntime as ort
        from tokenizers import Tokenizer
    except ImportError:
        return None
    if not os.path.exists(model_path):  # pragma: no cover
        return None
    sess = ort.InferenceSession(model_path)  # pragma: no cover
    tok = Tokenizer.from_pretrained("sentence-transformers/all-MiniLM-L6-v2")  # pragma: no cover
    return make_onnx_encode(sess, tok)  # pragma: no cover


def _fake_encoder() -> Callable:
    def encode(texts: list[str]) -> np.ndarray:
        return np.stack([textstats.fake_embed(t or "") for t in texts])

    return encode


def resolve_encoder(model: str | None = None) -> tuple[str, Callable]:
    """(backend_name, encode(list[str]) -> (n, EMBED_DIM) float32).

    ``model`` (or $CONTEXT_CRAWLER_EMBED_MODEL) selects the real path:
    a ``.onnx`` path → onnxruntime; anything else → sentence-transformers.
    Missing runtime/weights fall back to the deterministic stand-in — the
    job still runs, embeddings just aren't model-grade (and the backend
    name in metrics says so)."""
    model = model or os.environ.get(EMBED_MODEL_ENV)
    if model:
        if model.endswith(".onnx"):
            enc = _onnx_encoder(model)
            if enc is not None:
                return f"onnx:{model}", enc
        else:
            enc = _sentence_transformers_encoder(model)
            if enc is not None:
                return f"sentence-transformers:{model}", enc
    return "deterministic-stand-in", _fake_encoder()
