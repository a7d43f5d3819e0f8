#!/usr/bin/env python3
"""Oracle type-width lint (r9 verdict item 2).

The q34 family was red for five rounds because `sid = sum(brk) OVER (...)`
was emitted UNCAST: DuckDB silently widens integer window/aggregate sums to
HUGEINT (int128), `//` chains and DECIMAL(38) arithmetic widen similarly,
and the driver's hasher renders the widened type differently from BIGINT
while row-count and name-level schema checks still pass. This lint closes
the class: it PLANS (does not execute) every `oracleSql` entry in DuckDB
with the real testdata tables registered and FAILS if any output column's
planned type is in the widen class — HUGEINT, UHUGEINT, UBIGINT,
DECIMAL(...), or any other 128-bit type. Every oracle output column must be
explicitly CAST to its declared BIGINT/INTEGER/DOUBLE/VARCHAR/... type.

Also prints (informational, non-fatal) any column-type differences between
the oracle plan and the Spark parquet dump when the dump exists — the
driver hasher tolerates some of those (INTEGER vs BIGINT), so only the
widen class gates.

Usage: python3 tools/oraclelint.py [sfdir] [outdir-with-oracle_sql.json]
Exit 0 = zero widen-class hits; exit 1 otherwise.
"""
import json, os, sys

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types with no Spark counterpart whose values a driver-side hasher can
# render differently from the Spark column they are compared against.
WIDENED = ("HUGEINT", "UHUGEINT", "UBIGINT", "INT128", "UINT128")


def is_widened(t):
    u = str(t).upper()
    return u.startswith("DECIMAL") or any(u == w for w in WIDENED)


def main():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))
    hits, errors, mismatches = [], [], []
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])  # lazy: plans, does not execute
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:
            errors.append((name, str(e).splitlines()[0][:200]))
            continue
        for c, t in zip(cols, types):
            if is_widened(t):
                hits.append((name, c, t))
        dump = os.path.join(OUTDIR, name)
        if os.path.isdir(dump):
            try:
                mine = con.sql(f"SELECT * FROM read_parquet('{dump}/*.parquet') LIMIT 0")
                mtypes = dict(zip(mine.columns, [str(t) for t in mine.types]))
                for c, t in zip(cols, types):
                    mt = mtypes.get(c)
                    if mt is not None and mt != t:
                        mismatches.append((name, c, mt, t))
            except Exception:
                pass
    for name, c, t in hits:
        print(f"WIDENED  {name:28s} {c:20s} {t}")
    for name, e in errors:
        print(f"PLAN-ERROR {name:28s} {e}")
    if mismatches:
        print(f"\n-- informational: {len(mismatches)} spark-vs-oracle type "
              "diffs (non-fatal; widen class above is the gate) --")
        for name, c, mt, ot in mismatches:
            print(f"  {name:28s} {c:20s} spark={mt} oracle={ot}")
    print(f"\n{len(oracle)} oracles linted: {len(hits)} widened-type hits, "
          f"{len(errors)} plan errors")
    sys.exit(1 if (hits or errors) else 0)


if __name__ == "__main__":
    main()
