"""Named crawl-job registry — the reference's ``configurations/`` layer.

The reference defines jobs as typed config modules (e.g.
configurations/jobs/zod.ts:3-18) collected into an auto-generated registry
(configurations/index.ts:19-27, built by scripts/generate-job-index.ts) and
resolved by name at run time (``getJobConfigs``, src/config.ts:41-55); a
job name may map to ONE config or a LIST of configs (multi-config jobs,
aggregated into one output — src/cli.ts:452-532).

Here jobs register as plain dicts/CrawlConfigs; `define_job` validates
eagerly like ``defineJob`` → ``configSchema.parse``
(configurations/types.ts:99-105). Ships demo jobs over the synthetic web so
`run_job("site0-docs")` works out of the box.
"""

from __future__ import annotations

from typing import Any, Iterable

from .config import ConfigError, CrawlConfig

_REGISTRY: dict[str, list[CrawlConfig]] = {}


def define_job(
    name: str,
    config: CrawlConfig | dict[str, Any] | Iterable[CrawlConfig | dict[str, Any]],
    replace: bool = False,
) -> list[CrawlConfig]:
    """Register (and eagerly validate) a named job — one config or a list."""
    if isinstance(config, (CrawlConfig, dict)):
        config = [config]
    cfgs = [c if isinstance(c, CrawlConfig) else CrawlConfig.from_dict(c) for c in config]
    if not cfgs:
        raise ConfigError(f"job {name!r} has no configs")
    if name in _REGISTRY and not replace:
        raise ConfigError(f"job {name!r} already registered")
    _REGISTRY[name] = cfgs
    return cfgs


def get_job_configs(name: str) -> list[CrawlConfig]:
    """Parity with ``getJobConfigs`` (reference src/config.ts:41-55)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown job {name!r}; known: {sorted(_REGISTRY)}")
    return list(_REGISTRY[name])


def list_jobs() -> dict[str, int]:
    """Job name → config count (the /configurations endpoint's payload
    shape, reference src/server.ts:389-409)."""
    return {k: len(v) for k, v in sorted(_REGISTRY.items())}


# -- built-in demo jobs over the synthetic web (configurations/jobs/*) -------

define_job("site0-docs", CrawlConfig(
    entry="https://site0.test/",
    match=["https://site0.test/docs/**", "https://site0.test/guide/**"],
    exclude=["https://site0.test/support"],
    selector="article",
    name="site0-docs",
))

define_job("all-sites", [
    CrawlConfig(entry=f"https://site{i}.test/",
                match=[f"https://site{i}.test/docs/**"],
                selector="article", name=f"site{i}-docs")
    for i in range(3)
])
