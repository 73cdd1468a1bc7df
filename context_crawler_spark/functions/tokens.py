"""Token counting and text fingerprints.

The reference counts GPT tokens with the ``gpt-tokenizer`` package
(cl100k_base BPE; reference src/core.ts:11,422-425) for the maxTokens output
split. The exact cl100k merge table is not available in this environment, so
the engine pins a DETERMINISTIC BPE-style approximation: the cl100k
*pre-tokenizer* regex (public, from tiktoken) defines token boundaries and
long pieces are charged ceil(len/4) subtokens — the standard ~4-chars/token
heuristic. Swap ``count_tokens`` for real tiktoken on a cluster; everything
downstream (running-sum bucketing, file splitting) is tokenizer-agnostic.
"""

from __future__ import annotations

import re

# cl100k_base pre-tokenizer pattern (published in openai/tiktoken), with the
# possessive quantifiers Python's `re` lacks relaxed to greedy.
_PRETOKEN = re.compile(
    r"'(?:[sdmt]|ll|ve|re)|[^\r\n\w]?\w+|\d{1,3}|"
    r" ?[^\s\w]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
    re.UNICODE,
)

_SUBTOKEN_CHARS = 4


def count_tokens(text: str) -> int:
    """Deterministic BPE-ish token count (see module docstring)."""
    if not text:
        return 0
    n = 0
    for piece in _PRETOKEN.findall(text):
        n += max(1, -(-len(piece) // _SUBTOKEN_CHARS))
    return n


def count_whitespace_tokens(text: str) -> int:
    if not text:
        return 0
    return len(text.split())


def rolling_fingerprint(text: str, window: int = 64, mod: int = (1 << 61) - 1) -> int:
    """Karp-Rabin rolling-hash document fingerprint: min rolling hash over
    byte windows — a cheap, deterministic content fingerprint usable for
    near-dup candidate bucketing at scale."""
    data = text.encode("utf-8", "ignore")
    if not data:
        return 0
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * 257 + b) % mod
        return h
    base = 257
    pw = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * pw) * base + data[i]) % mod
        if h < best:
            best = h
    return best
