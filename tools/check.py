"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Runs every registered query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values. Strict mode hashes exact values (like the driver);
default mode also reports near-misses with a tolerance so FP issues are
diagnosable.

Usage: python tools/check.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import datetime as _dt
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from dbt_fal_spark.registry import all_queries  # noqa: E402
from dbt_fal_spark.session import get_spark  # noqa: E402
from dbt_fal_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


def pandas_rows(pdf) -> list[tuple]:
    """Rows via pandas, matching the driver's compare path. Deliberately
    does NOT undo pandas dtype coercions (e.g. DuckDB HUGEINT → float64,
    nullable int → float64 + NaN): the driver sees those too, and fetching
    native Python values instead masked a real driver hash mismatch in
    round 2 (q_profile_orders). Only numpy scalar wrappers are unboxed so
    repr() is version-stable."""
    def _py(v):
        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return [_py(x) for x in v]
        return v

    return [tuple(_py(v) for v in row) for row in pdf.itertuples(index=False, name=None)]


def norm_cell(v):
    if v is None:
        return "NULL"
    # Temporal: DuckDB's .df() promotes DATE to datetime64[ns] while Spark's
    # toPandas keeps datetime.date — the driver hashes those equal, so render
    # any midnight datetime as its date. pd.Timestamp subclasses datetime.
    if isinstance(v, _dt.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonical float repr
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_digest(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def rows_close(cols_a, rows_a, cols_b, rows_b, tol=1e-9) -> bool:
    if sorted(cols_a) != sorted(cols_b) or len(rows_a) != len(rows_b):
        return False
    ia = sorted(range(len(cols_a)), key=lambda i: cols_a[i])
    ib = sorted(range(len(cols_b)), key=lambda i: cols_b[i])

    def key(r, order):
        return tuple(norm_cell(r[i]) if not isinstance(r[i], float) else round(r[i], 6) for i in order)

    sa = sorted(rows_a, key=lambda r: str(key(r, ia)))
    sb = sorted(rows_b, key=lambda r: str(key(r, ib)))
    for ra, rb in zip(sa, sb):
        for i, j in zip(ia, ib):
            va, vb = ra[i], rb[j]
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if abs(va - vb) > tol * max(1.0, abs(va), abs(vb)):
                    return False
            elif norm_cell(va) != norm_cell(vb):
                return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    specs = all_queries()
    names = args.only.split(",") if args.only else sorted(specs)
    n_pass = n_close = n_fail = n_nooracle = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            scols = sdf.columns
            srows = pandas_rows(sdf.toPandas())
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            spark.catalog.clearCache()  # drop per-query persisted intermediates
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"NOOR  {name}: rows={len(srows)} cols={scols} ({t_spark:.1f}s) [rows-only check]")
            n_nooracle += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = pandas_rows(res.df())
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sh, oh = table_digest(scols, srows), table_digest(ocols, orows)
        if sh == oh:
            print(f"PASS  {name}: rows={len(srows)} ({t_spark:.1f}s)")
            n_pass += 1
        elif rows_close(scols, srows, ocols, orows):
            print(f"CLOSE {name}: rows={len(srows)}/{len(orows)} hash-mismatch but value-close (FP?)")
            n_close += 1
        else:
            print(f"FAIL  {name}: spark rows={len(srows)} cols={sorted(scols)}")
            print(f"      oracle rows={len(orows)} cols={sorted(ocols)}")
            # print first differing rows for debugging
            ia = sorted(range(len(scols)), key=lambda i: scols[i])
            ib = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sa = sorted(["|".join(norm_cell(r[i]) for i in ia) for r in srows])
            sb = sorted(["|".join(norm_cell(r[i]) for i in ib) for r in orows])
            shown = 0
            for x, y in zip(sa, sb):
                if x != y and shown < 3:
                    print(f"      spark : {x[:200]}")
                    print(f"      oracle: {y[:200]}")
                    shown += 1
            if len(sa) != len(sb):
                print(f"      row count differs: {len(sa)} vs {len(sb)}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_close} close, {n_fail} fail, {n_nooracle} no-oracle ==")
    return 1 if n_fail or n_close else 0


if __name__ == "__main__":
    sys.exit(main())
