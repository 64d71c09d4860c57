#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by `graft.Verify`) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB with the sfDir
parquet tables registered under their bare names, and compares:
  - schema: column names (sorted) must match
  - rows: multiset equality after sorting columns by name and rows by value
Prints PASS/FAIL per query. Exit code 1 if any FAIL.
"""
import glob
import json
import math
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return (type(v).__name__, str(v))


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def with_bits(t):
    """Render a canon tuple with IEEE bit patterns beside every float —
    so a hash mismatch that is invisible at print precision (or caused
    by double serialization) is diagnosable from this output alone."""
    def one(v):
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "f":
            bits = struct.pack(">d", float(v[1])).hex()
            return ("f", v[1], f"bits={bits}")
        if isinstance(v, tuple) and v and v[0] == "l":
            return ("l", tuple(one(x) for x in v[1]))
        return v
    return tuple(one(v) for v in t)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])  # optional query-name subset
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    result_dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = [d.rstrip("/").rsplit("/", 1)[-1] for d in result_dirs]
    if only:
        names = [n for n in names if n in only]
        # A mistyped subset name matches no result dir AND no oracle —
        # without this guard it silently yields "ALL PASS (0 queries)".
        unknown = only - set(names) - set(oracles)
        for name in sorted(unknown):
            print(f"  {name:28s} FAIL unknown query name (typo?)")
            failures += 1
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols, s_rows = list(spark_rel.columns), spark_rel.fetchall()
        if name not in oracles:
            # The driver sorts even rows-only outputs through pandas —
            # an array/list column crashes it (unhashable numpy.ndarray).
            # Sort the RAW frame exactly like the driver does: stringifying
            # first would mask the crash this guard exists to catch.
            try:
                s_df = spark_rel.fetchdf()
                s_df.sort_values(sorted(s_cols))
                sortable = True
            except Exception as e:
                print(f"  {name:28s} FAIL rows-only unsortable: {e}")
                failures += 1
                sortable = False
            if sortable:
                print(f"  {name:28s} rows-only: {len(s_rows)} rows "
                      f"{'PASS' if len(s_rows) > 0 else 'FAIL (0 rows)'}")
                if len(s_rows) == 0:
                    failures += 1
            continue
        try:
            o_rel = con.sql(oracles[name])
            o_cols, o_rows = list(o_rel.columns), o_rel.fetchall()
        except Exception as e:
            print(f"  {name:28s} FAIL oracle error: {e}")
            failures += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"  {name:28s} FAIL schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            failures += 1
            continue
        # Driver-sim pass: the real harness goes through pandas (fetchdf),
        # where DuckDB HUGEINT becomes float64 and list columns become
        # numpy arrays (unsortable). Compare stringified dataframes so any
        # dtype divergence (150 vs 150.0) fails HERE, not at the driver.
        try:
            s_df = spark_rel.fetchdf()
            o_df = con.sql(oracles[name]).fetchdf()
            cols = sorted(s_cols)
            # Sort the RAW frames (as the driver does — unsortable dtypes
            # must crash HERE), then stringify for the value compare.
            sa = s_df[cols].sort_values(cols).astype(str).values.tolist()
            ob = o_df[cols].sort_values(cols).astype(str).values.tolist()
            if sa != ob:
                bad = next(((i, x, y) for i, (x, y) in enumerate(zip(sa, ob))
                            if x != y),
                           (min(len(sa), len(ob)),
                            f"<{len(sa)} rows total>", f"<{len(ob)} rows total>"))
                print(f"  {name:28s} FAIL driver-sim (pandas dtype/format): "
                      f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}")
                failures += 1
                continue
        except Exception as e:
            print(f"  {name:28s} FAIL driver-sim crash: {type(e).__name__}: {e}")
            failures += 1
            continue
        a, b = rowset(s_cols, s_rows), rowset(o_cols, o_rows)
        if a == b:
            print(f"  {name:28s} PASS ({len(s_rows)} rows)")
        else:
            failures += 1
            print(f"  {name:28s} FAIL values: spark {len(a)} rows vs oracle {len(b)} rows")
            diff_a = [r for r in a if r not in set(map(tuple, b))][:3]
            diff_b = [r for r in b if r not in set(map(tuple, a))][:3]
            for r in diff_a:
                print(f"      spark-only : {with_bits(r)}")
            for r in diff_b:
                print(f"      oracle-only: {with_bits(r)}")
    # In subset mode, only subset members can be "missing" — reporting
    # every unselected query as a failure buried the subset's real result.
    missing = set(oracles) - set(names)
    if only:
        missing &= only
    for name in sorted(missing):
        print(f"  {name:28s} FAIL no spark result written")
        failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(names)} queries, {len(oracles)} with oracle)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
