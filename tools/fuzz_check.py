#!/usr/bin/env python3
"""Cross-engine differential fuzz checker (round-11 verdict task 1).

Usage: python3 tools/fuzz_check.py <fuzzDir>

For every <fuzzDir>/caseNNNN/ written by `runMain graft.FuzzDump`:
  - loads l.parquet / r.parquet as DuckDB views `l` and `r`,
  - runs the ANSI SQL recorded in case.json,
  - diffs against the Spark result parquet under caseNNNN/spark/.

Comparison: columns sorted by name, rows compared as a sorted multiset of
canonicalized tuples. Canonicalization: NULL/NaN -> sentinel; every numeric
(int, float, Decimal, bool) -> %.6f fixed-point (fuzz values are small, so
1e-6 is far above accumulated float error and far below any value gap);
timestamps -> ISO string; everything else -> str. A mismatch prints the
seed, the SQL, and both result multisets.
"""
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb


def canon_cell(x):
    if x is None:
        return "∅"
    if isinstance(x, float) and math.isnan(x):
        return "∅"
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, (int, float, Decimal)):
        # fold IEEE negative zero into +0.0: Spark's floor() narrows
        # through LONG (+0.0) while DuckDB's floor() stays DOUBLE and
        # preserves -0.0 — numerically equal, but %.6f renders them
        # '-0.000000' vs '0.000000' (caught live, seed 12164)
        v = float(x)
        return f"{v + 0.0:.6f}"
    # pandas.Timestamp / datetime both stringify stably; strip tz suffix noise
    s = str(x)
    return s[:-6] if s.endswith("+00:00") else s


def canon_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main(fuzz_dir: str) -> int:
    case_dirs = sorted(glob.glob(os.path.join(fuzz_dir, "case[0-9]*")))
    if not case_dirs:
        print(f"no case dirs under {fuzz_dir}")
        return 1
    failures = 0
    by_family = {}
    for cd in case_dirs:
        meta = json.load(open(os.path.join(cd, "case.json")))
        seed, family, sql = meta["seed"], meta["family"], meta["sql"]
        con = duckdb.connect()
        con.sql("SET TimeZone='UTC'")
        con.sql(f"CREATE VIEW l AS SELECT * FROM read_parquet('{cd}/l.parquet/*.parquet')")
        con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{cd}/r.parquet/*.parquet')")
        con.sql(f"CREATE VIEW a AS SELECT * FROM read_parquet('{cd}/a.parquet/*.parquet')")
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL seed={seed} [{family}]: DuckDB error: {e}\n  SQL: {sql}")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{cd}/spark/*.parquet')").df()
        ecols, erows = canon_rows(exp)
        gcols, grows = canon_rows(got)
        ok = True
        if ecols != gcols:
            print(f"FAIL seed={seed} [{family}]: columns spark={gcols} duckdb={ecols}")
            ok = False
        elif erows != grows:
            print(f"FAIL seed={seed} [{family}]: result mismatch "
                  f"({len(grows)} spark rows vs {len(erows)} duckdb rows)")
            print(f"  SQL: {sql}")
            only_g = [r for r in grows if r not in erows][:5]
            only_e = [r for r in erows if r not in grows][:5]
            print(f"  spark-only (first 5): {only_g}")
            print(f"  duckdb-only (first 5): {only_e}")
            ok = False
        if ok:
            by_family[family] = by_family.get(family, 0) + 1
        else:
            failures += 1
        con.close()
    total = len(case_dirs)
    print(f"\nfamilies: {json.dumps(by_family, sort_keys=True)}")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({total - failures}/{total} cross-engine cases green)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_fuzz"))
