"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from context_crawler_spark.session import get_spark

    s = get_spark(app_name="cc-spark-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tiny_web():
    """url -> html dict of the tiny synthetic site (oracle input)."""
    from context_crawler_spark.sources.synthetic_web import generate_pages

    rows = generate_pages(seed=42, n_hosts=3, pages_per_section=4)
    return {r["url"]: r["html"].decode("utf-8") for r in rows}


@pytest.fixture()
def tiny_pages(spark):
    from context_crawler_spark.sources.synthetic_web import generate_pages, pages_df

    return pages_df(spark, generate_pages(seed=42, n_hosts=3, pages_per_section=4))
