"""Tests for the langchain-JS-parity recursive splitter
(reference src/llm-service.ts:129-145, defaults src/llm-service.ts:15-17)."""

from context_crawler_spark.functions.chunker import (
    CHUNK_SEPARATORS,
    RecursiveCharacterTextSplitter,
    llms_txt_block,
    split_document,
)


def mk(size, overlap, seps=None):
    return RecursiveCharacterTextSplitter(
        chunk_size=size, chunk_overlap=overlap, separators=seps or CHUNK_SEPARATORS
    )


def test_short_text_single_chunk():
    assert mk(100, 10).split_text("hello world") == ["hello world"]


def test_splits_on_highest_priority_separator_present():
    text = "aaa\n---\nbbb\n---\nccc"
    chunks = mk(10, 0).split_text(text)
    # keepSeparator=true: separators stay attached to the following piece,
    # then trim() strips leading newlines
    assert chunks == ["aaa", "---\nbbb", "---\nccc"]


def test_falls_through_to_space():
    text = "one two three four five"
    chunks = mk(10, 0).split_text(text)
    assert all(len(c) <= 10 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_overlap_window():
    text = "a b c d e f g h"
    chunks = mk(6, 3).split_text(text)
    # every chunk fits, consecutive chunks share overlap content
    assert all(len(c) <= 6 for c in chunks)
    joined = " ".join(chunks)
    for tok in text.split():
        assert tok in joined


def test_oversized_unsplittable_piece_passes_through():
    # a single run longer than chunk_size with no separators inside
    text = "x" * 50
    chunks = mk(10, 0, seps=["\n\n", "\n", " "]).split_text(text)
    assert chunks == [text]  # no separator occurs; langchain passes it through


def test_overlap_clamped_below_size():
    s = RecursiveCharacterTextSplitter(chunk_size=10, chunk_overlap=50)
    assert s.chunk_overlap == 9  # reference clamp src/llm-service.ts:61-63


def test_reference_defaults_roundtrip():
    text = ("para one " * 300 + "\n\n") * 5  # ~13.5k chars
    chunks = mk(10000, 100).split_text(text)
    assert len(chunks) >= 2
    assert all(len(c) <= 10000 for c in chunks)


def test_document_framing():
    chunks = split_document("T", "https://u.test", "body text", 100, 0)
    assert chunks[0].startswith("Title: T\nURL: https://u.test")


def test_llms_txt_block_format():
    # exact format, reference src/llm-service.ts:114-123
    assert llms_txt_block("T", "U", "body") == "---\nTitle: T\nURL: U\n---\nbody"
