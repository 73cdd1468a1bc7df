"""Local replica of the driver's correctness gate: run every queries()
entry on Spark, run its oracle_sql() in DuckDB over the same parquet, and
compare row count / column names / order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    # --json PATH: also write a driver-artifact-shaped report (the
    # per-query {rows_match, schema_match, hash_match, spark_rows,
    # oracle_rows, err} dict) — committed per round as CONTRACT_rN.json so
    # the 50 queries outside the driver's correctness window still have a
    # witness in the round artifacts (VERDICT r4 #1).
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}
    import __spark_entry__ as entrymod
    from context_crawler_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark: {exc}"[:300]}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [rows-only]")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(rows),
                            "oracle_rows": None, "err": "no_oracle"}
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(rows),
                            "oracle_rows": None,
                            "err": f"duckdb: {exc}"[:300]}
            n_fail += 1
            continue
        problems = []
        # The driver fetches DuckDB results through a dataframe path where
        # HUGEINT (the default type of SUM(INTEGER/BIGINT)) renders differently
        # than Spark's BIGINT even when values are equal (r1: sessionize,
        # token_totals). fetchall() hides that via Python int — so flag the
        # *type* here: every integer aggregate must be CAST to BIGINT/INT.
        huge = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t.upper()]
        if huge:
            problems.append(
                f"oracle returns HUGEINT column(s) {huge} — CAST(... AS BIGINT)"
            )
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            h1, h2 = value_hash(rows, cols), value_hash(orows, ocols)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # show a few diffs
                s1 = {"\x1f".join(norm_cell(r[i]) for i in sorted(range(len(cols)), key=lambda i: cols[i])) for r in rows}
                s2 = {"\x1f".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                for d in list(s1 - s2)[:3]:
                    print(f"        spark-only: {d[:200]}")
                for d in list(s2 - s1)[:3]:
                    print(f"        duck-only:  {d[:200]}")
        schema_ok = sorted(cols) == sorted(ocols)
        rows_ok = len(rows) == len(orows)
        hash_ok = bool(not problems)
        report[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "spark_rows": len(rows),
            "oracle_rows": len(orows),
            "err": "; ".join(problems)[:300] if problems else None,
        }
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(rows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
