#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
 - registers each testdata parquet as a DuckDB view (tablename = filename)
 - runs every oracle_sql.json entry in DuckDB
 - loads the Spark-side parquet result
 - sorts columns by name, sorts rows, compares values exactly
"""
import sys, json, glob, math, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def norm(v):
    """Hash-faithful canonical form: the driver hashes RENDERED values, so
    5 (BIGINT) and 5.0 (HUGEINT fetched as float) must NOT compare equal.
    Encode every scalar as (kind, string)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return (type(v).__name__[:1], str(v))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracles):
    sql = oracles[name]
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    try:
        o = con.sql(sql)
        o_cols, o_rows = o.columns, o.fetchall()
        # HUGEINT leaves duckdb as float64/decimal through Arrow — the
        # driver's hash then sees "5.0" vs Spark's "5". Ban it outright.
        huge = [c for c, t in zip(o.columns, o.types)
                if str(t) in ("HUGEINT", "UHUGEINT", "INT128")]
        if huge:
            print(f"FAIL {name}: oracle returns HUGEINT columns {huge}; CAST them to BIGINT")
            fails += 1
            continue
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fails += 1
        continue
    try:
        s = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols, s_rows = s.columns, s.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark result read error: {str(e)[:200]}")
        fails += 1
        continue
    oc, orows = canon([c.lower() for c in o_cols], o_rows)
    sc, srows = canon([c.lower() for c in s_cols], s_rows)
    if oc != sc:
        print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
        fails += 1
        continue
    if len(orows) != len(srows):
        print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
        fails += 1
        continue
    bad = [(a, b) for a, b in zip(orows, srows) if a != b]
    if bad:
        # summarize first mismatch + max float delta
        maxd = 0.0
        for a, b in bad:
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    maxd = max(maxd, abs(x - y))
        print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]} maxFloatDelta={maxd}")
        fails += 1
        continue
    print(f"PASS {name} ({len(orows)} rows)")

missing = [n for n in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, n)) and n not in oracles]
for n in sorted(missing):
    try:
        cnt = con.sql(f"SELECT count(*) FROM read_parquet('{os.path.join(out_dir,n)}/*.parquet')").fetchone()[0]
        print(f"ROWS-ONLY {n}: {cnt} rows")
    except Exception as e:
        print(f"ROWS-ONLY {n}: unreadable: {str(e)[:120]}")
print(f"\n{len(oracles)-fails}/{len(oracles)} oracle queries pass; {len(missing)} rows-only")
sys.exit(1 if fails else 0)
