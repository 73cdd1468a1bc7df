"""Recursive character text splitter — exact-parity reimplementation of the
splitter the reference uses for LLM artifacts (langchain-JS
``RecursiveCharacterTextSplitter``; reference src/llm-service.ts:129-145 with
size 10000 / overlap 100 / separators ``['\\n---\\n', '\\n\\n', '\\n', ' ']``,
src/llm-service.ts:15-17).

Semantics pinned (langchain-JS, keepSeparator=true default):
  * pick the first separator that is ``''`` or occurs in the text
  * keepSeparator → split with a lookahead regex, so each piece keeps its
    leading separator and pieces are merged with the empty string
  * pieces shorter than chunk_size accumulate; an oversized piece flushes the
    accumulator and recurses with the remaining separators
  * merge keeps a sliding overlap window: after emitting a chunk, leading
    pieces pop while total > overlap (or while the next piece would overflow)
  * each emitted chunk is ``.trim()``-ed; empty chunks are dropped

Lengths are measured in UTF-16 code units (JS ``String.length``) for strict
parity — ``_js_len`` differs from ``len`` only for astral-plane characters.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_CHUNK_SIZE = 10000
DEFAULT_CHUNK_OVERLAP = 100
CHUNK_SEPARATORS = ["\n---\n", "\n\n", "\n", " "]


def _js_len(s: str) -> int:
    """JS String.length: UTF-16 code units."""
    return len(s) + sum(1 for ch in s if ord(ch) > 0xFFFF)


@dataclass
class RecursiveCharacterTextSplitter:
    chunk_size: int = DEFAULT_CHUNK_SIZE
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP
    separators: list[str] = field(default_factory=lambda: list(CHUNK_SEPARATORS))
    keep_separator: bool = True

    def __post_init__(self) -> None:
        # reference clamps overlap below size (src/llm-service.ts:61-63)
        if self.chunk_overlap >= self.chunk_size:
            self.chunk_overlap = max(0, self.chunk_size - 1)

    # -- langchain-JS TextSplitter.splitOnSeparator ------------------------
    def _split_on_separator(self, text: str, separator: str) -> list[str]:
        if separator:
            if self.keep_separator:
                splits = re.split(f"(?={re.escape(separator)})", text)
            else:
                splits = text.split(separator)
        else:
            splits = list(text)
        return [s for s in splits if s != ""]

    # -- langchain-JS TextSplitter.mergeSplits -----------------------------
    def _merge_splits(self, splits: list[str], separator: str) -> list[str]:
        sep_len = _js_len(separator)
        docs: list[str] = []
        current: list[str] = []
        total = 0
        for d in splits:
            d_len = _js_len(d)
            if total + d_len + (sep_len if current else 0) > self.chunk_size:
                if current:
                    doc = self._join_docs(current, separator)
                    if doc is not None:
                        docs.append(doc)
                    while total > self.chunk_overlap or (
                        total + d_len + (sep_len if current else 0) > self.chunk_size
                        and total > 0
                    ):
                        total -= _js_len(current[0]) + (
                            sep_len if len(current) > 1 else 0
                        )
                        current.pop(0)
            current.append(d)
            total += d_len + (sep_len if len(current) > 1 else 0)
        doc = self._join_docs(current, separator)
        if doc is not None:
            docs.append(doc)
        return docs

    @staticmethod
    def _join_docs(docs: list[str], separator: str) -> str | None:
        text = separator.join(docs).strip()
        return text if text else None

    # -- langchain-JS RecursiveCharacterTextSplitter._splitText ------------
    def split_text(self, text: str) -> list[str]:
        return self._split_text(text, self.separators)

    def _split_text(self, text: str, separators: list[str]) -> list[str]:
        final_chunks: list[str] = []
        separator = separators[-1] if separators else ""
        new_separators: list[str] | None = None
        for i, s in enumerate(separators):
            if s == "":
                separator = s
                break
            if s in text:
                separator = s
                new_separators = separators[i + 1 :]
                break
        splits = self._split_on_separator(text, separator)
        good_splits: list[str] = []
        _separator = "" if self.keep_separator else separator
        for s in splits:
            if _js_len(s) < self.chunk_size:
                good_splits.append(s)
            else:
                if good_splits:
                    final_chunks.extend(self._merge_splits(good_splits, _separator))
                    good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split_text(s, new_separators))
        if good_splits:
            final_chunks.extend(self._merge_splits(good_splits, _separator))
        return final_chunks


def split_document(
    title: str,
    url: str,
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[str]:
    """Document → chunks with the reference's page-content framing
    (``Title: {t}\\nURL: {u}\\n\\n{text}``, src/llm-service.ts:135-144)."""
    splitter = RecursiveCharacterTextSplitter(chunk_size, chunk_overlap)
    return splitter.split_text(f"Title: {title}\nURL: {url}\n\n{text}")


def llms_txt_block(title: str, url: str, text: str) -> str:
    """One llms.txt block (src/llm-service.ts:114-123); blocks join with
    ``\\n\\n``."""
    return f"---\nTitle: {title}\nURL: {url}\n---\n{text}"
