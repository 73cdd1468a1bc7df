"""Text analysis primitives for large-scale training-data pipelines.

These are the per-document scalar functions a 100 TB webtext pipeline runs
after extraction (the reference stops at extraction + chunking; these extend
the capability set for training-data curation): language ID, quality
scoring, token counting, shingling, MinHash and SimHash fingerprints.

All pure Python/numpy on strings — invoked only from Arrow-batched pandas
UDFs (udfs.py); nothing here runs per-row through Spark's Python UDF path.
Everything is deterministic (fixed seeds / fixed hash functions) so results
are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import math
import re
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Language identification — stopword-profile heuristic.
# A real deployment swaps in fastText lid.176; the engine interface
# (text -> (lang, score)) is identical.
# ---------------------------------------------------------------------------

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be this by an at "
        "from or have not but had his they you which one were her all she there "
        "been if more when will would who so no out up into them then its".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit sich des auf für ist im dem nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem über einen so zum war haben nur oder aber vor".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est pour qui dans a par plus pas "
        "au sur ne se ce il sont la vous je son avec ils mais comme ou si leur "
        "y dont elle tout deux meme ces aux etre fait".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo "
        "como mas pero sus le ya o este si porque esta entre cuando muy sin "
        "sobre tambien me hasta hay donde quien desde todo nos".split()
    ),
}

_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ']+")


def detect_language(text: str, max_words: int = 400) -> tuple[str, float]:
    """(lang, confidence) via stopword-hit-rate profiles.

    Confidence = best hit-rate minus runner-up hit-rate, clamped to [0,1];
    'und' (undetermined) when no profile scores."""
    if not text:
        return "und", 0.0
    words = [w.lower() for w in _WORD_RE.findall(text)[:max_words]]
    if not words:
        return "und", 0.0
    scores = {
        lang: sum(1 for w in words if w in sw) / len(words)
        for lang, sw in _STOPWORDS.items()
    }
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    best, second = ranked[0], ranked[1]
    if best[1] == 0.0:
        return "und", 0.0
    return best[0], min(1.0, max(0.0, best[1] - second[1] + best[1]))


# ---------------------------------------------------------------------------
# Quality scoring — Gopher/C4-style cheap heuristics.
# ---------------------------------------------------------------------------

_SENT_END = re.compile(r"[.!?]")
_ALNUM = re.compile(r"[A-Za-z0-9]")


def quality_features(text: str) -> dict[str, float]:
    """Cheap quality features over one document: lengths, ratios used by
    C4/Gopher-style filters. Deterministic, pure."""
    if not text:
        return {
            "n_chars": 0.0, "n_words": 0.0, "mean_word_len": 0.0,
            "alnum_ratio": 0.0, "stop_ratio": 0.0, "sent_per_100w": 0.0,
            "max_line_frac": 0.0, "dup_line_frac": 0.0,
        }
    words = text.split()
    n_words = len(words)
    n_chars = len(text)
    alnum = len(_ALNUM.findall(text))
    stops = sum(1 for w in words if w.lower().strip(".,;:!?") in _STOPWORDS["en"])
    sents = len(_SENT_END.findall(text))
    lines = [ln for ln in text.split("\n") if ln.strip()]
    max_line = max((len(ln) for ln in lines), default=0)
    uniq_lines = len(set(lines))
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "alnum_ratio": alnum / n_chars if n_chars else 0.0,
        "stop_ratio": stops / n_words if n_words else 0.0,
        "sent_per_100w": 100.0 * sents / n_words if n_words else 0.0,
        "max_line_frac": max_line / n_chars if n_chars else 0.0,
        "dup_line_frac": 1.0 - uniq_lines / len(lines) if lines else 0.0,
    }


def quality_score(text: str) -> float:
    """Single scalar in [0,1]: product of soft gates over the features —
    a C4-ish 'keep' score. Pinned constants; golden-tested."""
    f = quality_features(text)
    if f["n_words"] < 1:
        return 0.0

    def gate(x: float, lo: float, hi: float) -> float:
        if x < lo:
            return max(0.0, x / lo) if lo > 0 else 0.0
        if x > hi:
            return max(0.0, 1.0 - (x - hi) / max(hi, 1e-9))
        return 1.0

    s = 1.0
    s *= gate(f["n_words"], 5.0, 1_000_000.0)
    s *= gate(f["mean_word_len"], 2.0, 12.0)
    s *= gate(f["alnum_ratio"], 0.55, 1.0)
    s *= gate(f["dup_line_frac"], 0.0, 0.3)
    return round(s, 6)


# ---------------------------------------------------------------------------
# Shingles / MinHash / SimHash — near-dup fingerprints.
# Hash function: first 8 bytes of md5 (stable across platforms/versions,
# unlike Python's salted hash()); seeds mix in via prefix bytes.
# ---------------------------------------------------------------------------

_NORM_WS = re.compile(r"\s+")


def normalize_for_shingling(text: str) -> str:
    """Lowercase, collapse whitespace — the canonical near-dup text form."""
    return _NORM_WS.sub(" ", text.lower()).strip()


def char_shingles(text: str, k: int = 5) -> set[str]:
    t = normalize_for_shingling(text)
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = normalize_for_shingling(text).split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _h64(data: bytes, seed: int = 0) -> int:
    d = hashlib.md5(seed.to_bytes(4, "little") + data).digest()
    return struct.unpack("<Q", d[:8])[0]


# MinHash via the standard (a*x + b) mod p universal family over one base
# 64-bit hash per shingle — one md5 per shingle total, not per permutation.
_MERSENNE_61 = (1 << 61) - 1
_MAX_PERM = 256
_rng = np.random.RandomState(1729)  # fixed seed: signatures are part of the data contract
_PERM_A = _rng.randint(1, _MERSENNE_61, size=_MAX_PERM, dtype=np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE_61, size=_MAX_PERM, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrap-around uint64 arithmetic)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def shingle_base_hashes(text: str, k: int = 5) -> np.ndarray:
    """Unique 64-bit hashes of the byte k-shingles of the normalized text —
    FULLY vectorized: sliding byte windows (stride tricks) packed into
    uint64 then splitmix-mixed. No per-shingle Python. Shingles are k BYTES
    of the UTF-8 form (equivalent to char shingles for ASCII; a deliberate,
    pinned redefinition for multi-byte text)."""
    b = np.frombuffer(
        normalize_for_shingling(text).encode("utf-8"), dtype=np.uint8
    )
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if b.size < k:
        padded = np.zeros(k, dtype=np.uint8)
        padded[: b.size] = b
        windows = padded[None, :]
    else:
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
    weights = (np.uint64(1) << (np.uint64(8) * np.arange(k, dtype=np.uint64)))
    packed = (windows.astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return _splitmix64(np.unique(packed))


def minhash_signature(text: str, num_perm: int = 128, k: int = 5) -> list[int]:
    """MinHash signature over byte-k shingles. Returns ``num_perm`` int64s
    (reinterpreted from uint64 minima for Spark LongType storage)."""
    assert num_perm <= _MAX_PERM
    base = shingle_base_hashes(text, k)
    if base.size == 0:
        return [0] * num_perm
    a = _PERM_A[:num_perm, None]
    b = _PERM_B[:num_perm, None]
    # (a*x+b) mod p on uint64: wrap-around multiplication is fine — we only
    # need a fixed deterministic universal-ish family, not number theory.
    hashed = (a * base[None, :] + b) % np.uint64(_MERSENNE_61)
    mins = hashed.min(axis=1)
    return mins.view(np.int64).tolist()


def minhash_signatures_batch(
    texts, num_perm: int = 128, k: int = 5
) -> np.ndarray:
    """Batched :func:`minhash_signature` over a list of texts — returns an
    ``(n_rows, num_perm)`` int64 array, bit-identical to the scalar form
    (property-tested). The scalar path pays ~6 numpy dispatches per ROW on
    small ``(num_perm × n_shingles)`` matrices; this concatenates every
    row's base hashes into one stream and takes the per-row minima with a
    single ``np.minimum.reduceat`` per chunk (guide §4.2). The generic
    ``% M61`` also becomes the exact Mersenne shift-add reduction:
    for any uint64 ``z``, ``z mod (2^61-1) == ((z & M) + (z >> 61))``
    followed by one conditional subtract — the same wrapped ``z`` the
    scalar path reduces, so every minimum is bit-unchanged."""
    assert num_perm <= _MAX_PERM
    n = len(texts)
    out = np.zeros((n, num_perm), dtype=np.uint64)
    bases = [shingle_base_hashes(t or "", k) for t in texts]
    counts = np.fromiter((b.size for b in bases), dtype=np.int64, count=n)
    nz = np.flatnonzero(counts)  # zero-shingle rows stay [0]*num_perm
    if nz.size:
        stream = np.concatenate([bases[i] for i in nz])
        ends = np.cumsum(counts[nz])
        offs = np.empty(nz.size, dtype=np.int64)
        offs[0] = 0
        offs[1:] = ends[:-1]
        a = _PERM_A[:num_perm, None]
        b = _PERM_B[:num_perm, None]
        M = np.uint64(_MERSENNE_61)
        sh = np.uint64(61)
        # chunk rows so the (num_perm × chunk_shingles) matrix stays
        # L2-cache-resident — measured 2.7x faster than 8M-element chunks
        # (the big matrices stream every temporary from DRAM)
        max_shingles = max(64_000 // num_perm, int(counts.max()))
        start = 0
        while start < nz.size:
            end = int(np.searchsorted(ends, offs[start] + max_shingles,
                                      side="right"))
            end = min(max(end, start + 1), nz.size)
            s, e = offs[start], ends[end - 1]
            z = a * stream[None, s:e] + b  # wrap-around uint64, as scalar
            y = (z & M) + (z >> sh)
            y = np.where(y >= M, y - M, y)  # == z % M61 exactly
            mins = np.minimum.reduceat(y, offs[start:end] - s, axis=1)
            out[nz[start:end]] = mins.T
            start = end
    return out.view(np.int64)


def _bandkeys_from_sigs(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Band keys for a 2-D ``(n_rows, num_perm)`` int64 signature array —
    bit-identical to per-row :func:`minhash_bands` (``struct.pack('<Nq')``
    bytes == the little-endian int64 buffer sliced per row)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    out = np.empty((n, bands), dtype=np.int64)
    step = rows * 8
    for bi in range(bands):
        seed = (bi + 1).to_bytes(4, "little")
        buf = np.ascontiguousarray(sigs[:, bi * rows:(bi + 1) * rows]
                                   ).astype("<i8", copy=False).tobytes()
        col = out[:, bi]
        for i in range(n):
            d = hashlib.md5(seed + buf[i * step:(i + 1) * step]).digest()
            col[i] = np.uint64(struct.unpack("<Q", d[:8])[0]).astype(np.int64)
    return out


def minhash_bandkeys_batch(
    texts, num_perm: int = 128, bands: int = 16, k: int = 5
) -> np.ndarray:
    """Fused text → LSH band keys for a batch: batched signatures + batched
    band hashing, bit-identical to
    ``minhash_bands(minhash_signature(text))`` per row."""
    return _bandkeys_from_sigs(
        minhash_signatures_batch(texts, num_perm, k), bands)


def minhash_bands(sig: list[int], bands: int = 16) -> list[int]:
    """LSH band keys: hash each band of the signature to one int64 bucket id.
    Two docs sharing ANY band key are near-dup candidates."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        band = sig[b * rows : (b + 1) * rows]
        out.append(
            np.int64(np.uint64(_h64(struct.pack(f"<{rows}q", *band), seed=b + 1)))
        )
    return [int(x) for x in out]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams+bigrams (signed int64 for Spark).
    Bit voting is one vectorized matrix op over all feature hashes."""
    words = normalize_for_shingling(text).split()
    if not words:
        return 0
    feats = words + [" ".join(p) for p in zip(words, words[1:])]
    h = np.fromiter(
        (_h64(f.encode("utf-8")) for f in feats), dtype=np.uint64, count=len(feats)
    )
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.nonzero(v > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash64_batch(texts: list) -> np.ndarray:
    """Vectorized :func:`simhash64` over a batch of texts — bit-identical
    output (tests pin equality against the scalar form on every corpus
    fixture). The scalar path pays one Python ``hashlib.md5`` call PER
    FEATURE OCCURRENCE (~600/doc → tens of millions per corpus pass);
    this batches three ways (guide §4.2):

    1. hash each DISTINCT feature once per batch (np.unique + inverse —
       md5 is the dominant cost and word/bigram vocabularies are far
       smaller than their occurrence streams);
    2. one bit-matrix + ``np.add.reduceat`` at row offsets replaces the
       per-row (feats × 64) vote matmul — the vote is
       ``2·Σbits − n_feats`` per row, the same integers the scalar
       ``Σ(2b−1)`` computes;
    3. rows chunked so the int32 bit matrix stays ~25 MB regardless of
       batch size.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    feats_per_row: list[list[str]] = []
    for t in texts:
        words = normalize_for_shingling(t or "").split()
        feats_per_row.append(
            words + [" ".join(p) for p in zip(words, words[1:])]
            if words else []
        )
    shifts = np.arange(64, dtype=np.uint64)
    row = 0
    CHUNK_FEATS = 400_000
    while row < n:
        end = row
        total = 0
        while end < n and (total == 0 or
                           total + len(feats_per_row[end]) <= CHUNK_FEATS):
            total += len(feats_per_row[end])
            end += 1
        rows = range(row, end)
        nonempty = [i for i in rows if feats_per_row[i]]
        if nonempty:
            flat: list[str] = []
            starts = []
            cnts = []
            for i in nonempty:
                starts.append(len(flat))
                flat.extend(feats_per_row[i])
                cnts.append(len(feats_per_row[i]))
            uniq, inv = np.unique(np.asarray(flat, dtype=object),
                                  return_inverse=True)
            hu = np.fromiter(
                (_h64(f.encode("utf-8")) for f in uniq),
                dtype=np.uint64, count=len(uniq),
            )
            h = hu[inv]
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            sums = np.add.reduceat(bits, np.asarray(starts), axis=0)
            v = 2 * sums - np.asarray(cnts, dtype=np.int64)[:, None]
            sigs = ((v > 0).astype(np.uint64) << shifts).sum(
                axis=1, dtype=np.uint64).view(np.int64)
            out[np.asarray(nonempty)] = sigs
        row = end
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_bands(sig: int, bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``bands`` chunks (Charikar block
    permutation LSH): docs within hamming distance < bands share ≥1 block."""
    width = 64 // bands
    mask = (1 << width) - 1
    u = sig & ((1 << 64) - 1)
    return [((u >> (i * width)) & mask) | (i << width) for i in range(bands)]


# ---------------------------------------------------------------------------
# Deterministic embedding stand-in (MiniLM-L6-v2 replacement).
# ---------------------------------------------------------------------------

EMBED_DIM = 384


def fake_embed(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic unit-norm embedding: hashed bag-of-words into ``dim``
    buckets with md5-signed counts, then L2 normalization — same contract as
    the reference's mean-pooled, L2-normalized MiniLM vectors (reference
    src/xenova-embeddings.ts:38-45). Texts sharing vocabulary land near each
    other, so top-k cosine behaves sanely in tests. Swap for a real model
    UDF on a cluster; the column type (array<float>, unit norm) is identical.
    """
    v = np.zeros(dim, dtype=np.float64)
    # newline-strip parity with reference src/xenova-embeddings.ts:105-110
    words = normalize_for_shingling(text.replace("\n", " ")).split()
    for w in words:
        h = _h64(w.encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 63) & 1 else -1.0
        v[idx] += sign
    n = math.sqrt(float(np.dot(v, v)))
    if n == 0.0:
        v[0] = 1.0
        n = 1.0
    return (v / n).astype(np.float32)
