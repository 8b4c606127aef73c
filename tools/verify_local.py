#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify.scala output dir (spark parquet per query +
oracle_sql.json), runs each oracle SQL in DuckDB against the same
testdata parquet (bare table names -> views), and compares result sets
exactly: columns sorted by name, rows sorted, values compared with
exact equality (floats reported with max abs diff when unequal).

Usage: python3 tools/verify_local.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            failures += 1
            continue
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns differ: oracle={ecols} spark={gcols}")
            failures += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={exp.num_rows} spark={got.num_rows}")
            failures += 1
            continue
        def key(row):
            return tuple((v is None, str(v) if isinstance(v, (list, dict)) else v)
                         for v in row)
        erows = sorted([tuple(r[c] for c in ecols) for r in exp.to_pylist()], key=key)
        grows = sorted([tuple(r[c] for c in gcols) for r in got.to_pylist()], key=key)
        float_bad = None
        hard_bad = None
        maxdiff = 0.0
        for i, (er, gr) in enumerate(zip(erows, grows)):
            for c, (ev, gv) in enumerate(zip(er, gr)):
                if ev == gv:
                    continue
                if isinstance(ev, float) and isinstance(gv, float):
                    if math.isnan(ev) and math.isnan(gv):
                        continue
                    maxdiff = max(maxdiff, abs(ev - gv))
                    if float_bad is None:
                        float_bad = (i, ecols[c], ev, gv)
                else:
                    if hard_bad is None:
                        hard_bad = (i, ecols[c], ev, gv)
                    break
            if hard_bad:
                break
        # a hard (non-float) mismatch always outranks float noise
        bad = hard_bad or float_bad
        if bad:
            i, c, ev, gv = bad
            print(f"FAIL {name}: first diff at row {i} col {c}: oracle={ev!r} spark={gv!r}"
                  + (f" (max float diff {maxdiff:g})" if maxdiff else ""))
            failures += 1
        else:
            # also check exact schema types for early warning (not fatal)
            et = {f.name: str(f.type) for f in exp.schema}
            gt = {f.name: str(f.type) for f in got.schema}
            tw = {k: (et[k], gt[k]) for k in et if et[k] != gt.get(k)}
            note = f"  [type drift: {tw}]" if tw else ""
            print(f"PASS {name} ({exp.num_rows} rows){note}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
