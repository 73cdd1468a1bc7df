"""Named-job registry (reference configurations/ + getJobConfigs)."""

from __future__ import annotations

import pytest

from context_crawler_spark.config import ConfigError, CrawlConfig
from context_crawler_spark.registry import define_job, get_job_configs, list_jobs


def test_builtin_jobs_resolve():
    cfgs = get_job_configs("site0-docs")
    assert len(cfgs) == 1 and cfgs[0].selector == "article"
    multi = get_job_configs("all-sites")
    assert [c.name for c in multi] == ["site0-docs", "site1-docs", "site2-docs"]
    assert list_jobs()["all-sites"] == 3


def test_define_validates_and_guards_duplicates():
    with pytest.raises(KeyError):
        get_job_configs("nope")
    with pytest.raises(ConfigError):
        define_job("bad", {"entry": "not-a-url"})
    with pytest.raises(ConfigError):
        define_job("site0-docs", CrawlConfig(entry="https://x.test/"))
    define_job("site0-docs", CrawlConfig(entry="https://x.test/", name="override"),
               replace=True)
    assert get_job_configs("site0-docs")[0].name == "override"
    # restore the builtin for other tests
    define_job("site0-docs", CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/docs/**", "https://site0.test/guide/**"],
        exclude=["https://site0.test/support"],
        selector="article", name="site0-docs"), replace=True)


def test_make_dist_zip_matches_source_tree(tmp_path, monkeypatch):
    """ADVICE r1: the --py-files zip must contain exactly the package's .py
    files (a stale/partial zip silently skews executor vs driver code)."""
    import os
    import zipfile

    from tools import make_dist

    monkeypatch.setattr(make_dist, "ROOT", str(tmp_path), raising=False)
    import shutil

    src_pkg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(make_dist.__file__))), "context_crawler_spark")
    shutil.copytree(src_pkg, str(tmp_path / "context_crawler_spark"),
                    ignore=shutil.ignore_patterns("__pycache__"))
    out = make_dist.main()
    with zipfile.ZipFile(out) as zf:
        in_zip = {n for n in zf.namelist() if n.endswith(".py")}
    on_disk = set()
    for base, _dirs, files in os.walk(src_pkg):
        if "__pycache__" in base:
            continue
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(base, f),
                                      os.path.dirname(src_pkg))
                on_disk.add(rel)
    assert in_zip == on_disk
