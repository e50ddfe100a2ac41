#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against the DuckDB oracle SQL, per query.

Type-faithful: both sides are fetched as Arrow tables and the PHYSICAL
column types are compared (after sorting columns by name), so a DuckDB
HUGEINT from a bare SUM(BIGINT), or a ns-precision timestamp, fails here
exactly like it fails the driver's hash check — even when Python values
would compare equal.

Usage: python3 scripts/selfcheck.py [sfDir] [verifyOutDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t)), [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact: our queries are engineered bit-identical
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def fetch(con, sql):
    """Execute ONCE, return (cols, rows, {col: arrow_type_str}).
    A single arrow() materialization provides both the physical types the
    driver's hash check is sensitive to and the row values."""
    tbl = con.execute(sql).arrow()
    cols = [f.name for f in tbl.schema]
    types = {f.name: str(f.type) for f in tbl.schema}
    data = [c.to_pylist() for c in tbl.columns]
    rows = list(zip(*data)) if data else []
    return cols, rows, types


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # Completeness gate: every registry key must have produced an output
    # dir. Round 5's events breakage shrank the gate silently (179->141,
    # zero err entries) because a throwing query simply had no directory.
    reg_path = os.path.join(out_dir, "queries.json")
    if os.path.exists(reg_path):
        with open(reg_path) as f:
            registry = set(json.load(f))
        for missing in sorted(registry - set(names)):
            results[missing] = "MISSING-OUTPUT (query produced no dir)"
    for name in names:
        err_marker = os.path.join(out_dir, name, "_ERROR")
        if os.path.exists(err_marker):
            with open(err_marker) as f:
                results[name] = "QUERY-ERROR " + f.read().strip()[:300]
            continue
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            s_cols, s_rows, s_types = fetch(con, f"SELECT * FROM '{spark_glob}'")
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        # The driver's pandas comparator factorizes object columns for its
        # canonical sort; numpy arrays are unhashable, so ANY nested-typed
        # output column is ungateable (round-3 q_postings). Flag it here so
        # local green predicts driver green.
        nested = [(c, t) for c, t in s_types.items()
                  if t.startswith(("list", "large_list", "fixed_size_list",
                                   "struct", "map"))]
        if nested:
            results[name] = "NESTED-TYPED-OUTPUT " + ", ".join(
                f"{c}: {t}" for c, t in nested)
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(s_rows)} rows)"
            continue
        try:
            o_cols, o_rows, o_types = fetch(con, oracles[name])
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        s_canon, s_c = canon(s_rows, s_cols)
        o_canon, o_c = canon(o_rows, o_cols)
        if s_c != o_c:
            results[name] = f"SCHEMA-MISMATCH spark={s_c} oracle={o_c}"
            continue
        # physical (Arrow) type check — the driver hashes the representation
        tbad = [(c, s_types.get(c), o_types.get(c)) for c in s_c
                if s_types.get(c) != o_types.get(c)]
        if tbad:
            results[name] = "TYPE-MISMATCH " + ", ".join(
                f"{c}: spark={st} oracle={ot}" for c, st, ot in tbad)
            continue
        if len(s_canon) != len(o_canon):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(s_canon)} oracle={len(o_canon)}"
            continue
        bad = None
        for i, (srow, orow) in enumerate(zip(s_canon, o_canon)):
            if not all(eq(a, b) for a, b in zip(srow, orow)):
                bad = (i, srow, orow)
                break
        results[name] = "OK" if bad is None else f"VALUE-MISMATCH row{bad[0]} spark={bad[1]} oracle={bad[2]}"
    n_ok = sum(1 for v in results.values()
               if v == "OK" or v.startswith("rows-only"))
    n_rows_only = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k in sorted(results):
        flag = "PASS" if (results[k] == "OK" or results[k].startswith("rows-only")) else "FAIL"
        print(f"[{flag}] {k}: {results[k]}")
    print(f"== {n_ok}/{len(results)} pass ({n_rows_only} rows-only) ==")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
