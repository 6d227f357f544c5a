"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Not the driver's exact hash, but any mismatch here would be a
mismatch there.

Usage: python tools/local_verify.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seoul_big_data_spark.session import get_spark  # noqa: E402
from seoul_big_data_spark.sources.tables import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full round-trip precision (shortest repr). The r5 gate failure
        # (timeseries_linear_interpolate) passed locally under the old %.6g
        # canon — 6 *significant* digits, strictly coarser than the driver's
        # hash — so a last-ulp float-accumulation divergence was invisible
        # here and red at the driver. The local mirror must be at least as
        # strict as the driver on fractional values.
        return repr(v)
    if isinstance(v, (list, tuple, dict, set)):
        # Mirror the driver's canonicalizer, which pandas-sorts result
        # frames and dies on container-typed cells (the r4
        # embedding_quantize_int8 gate failure). The local gate must fail
        # exactly where the driver fails — serialize arrays to strings in
        # the query itself instead.
        raise TypeError(
            f"complex-typed cell in query output: {type(v).__name__}"
        )
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return len(rows), sorted_cols, hash(tuple(canon_rows))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("local_verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {e}"
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            # The driver canonicalizes rows-only outputs too (pandas sort
            # over every cell) — the r7 embedding_pq_codes crash happened
            # on a rows-only entry this branch used to short-circuit past.
            # Run canon() over every cell so the mirror fails exactly where
            # the driver fails, oracle or not.
            try:
                for r in srows:
                    for v in r:
                        canon(v)
            except TypeError as e:
                results[name] = f"COMPLEX TYPE: {e}"
                print(f"FAIL {name}: rows-only canonicalization: {e}")
                continue
            results[name] = f"rows-only: {len(srows)} rows"
            print(f"OK?  {name}: no oracle, {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:  # noqa: BLE001
            results[name] = f"DUCKDB ERROR: {e}"
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        try:
            sn, sc, sh = frame_digest(scols, srows)
            dn, dc, dh = frame_digest(dcols, drows)
        except TypeError as e:
            results[name] = f"COMPLEX TYPE: {e}"
            print(f"FAIL {name}: {e}")
            continue
        if sn != dn:
            results[name] = f"ROWCOUNT {sn} vs {dn}"
            print(f"FAIL {name}: rowcount spark={sn} duckdb={dn}")
        elif sc != dc:
            results[name] = f"SCHEMA {sc} vs {dc}"
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
        elif sh != dh:
            results[name] = "VALUE HASH MISMATCH"
            # find first differing row for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = sorted("|".join(canon(r[i]) for i in order) for r in srows)
            dset = sorted("|".join(canon(r[i]) for i in dorder) for r in drows)
            diff = next(
                ((a, b) for a, b in zip(sset, dset) if a != b), ("<none>", "<none>")
            )
            print(f"FAIL {name}: value mismatch\n  spark : {diff[0]}\n  duckdb: {diff[1]}")
        else:
            results[name] = "MATCH"
            print(f"OK   {name}: {sn} rows match")
    n_ok = sum(1 for v in results.values() if v == "MATCH" or v.startswith("rows-only"))
    print(json.dumps({"total": len(results), "ok": n_ok}))
    spark.stop()


if __name__ == "__main__":
    main()
