#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query output
written by graft.Verify, run the paired oracle SQL in DuckDB over the same
sf tables and compare (columns sorted by name, rows sorted, values
normalized). Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import json, math, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to python objects with rounded floats
    def norm(v):
        # list-typed cells (numpy arrays / lists) -> tuples so equality and
        # sorting behave scalar-wise
        if hasattr(v, "tolist") and not hasattr(v, "timestamp"):
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "timestamp") and not isinstance(v, str):  # datetime-like
            return str(v)
        if isinstance(v, (int,)):
            return int(v)
        try:
            import decimal
            if isinstance(v, decimal.Decimal):
                return float(v)
        except Exception:
            pass
        return v
    out = df.applymap(norm)
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(lambda x: (x is None, str(x)))).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(out_dir, name)
        try:
            got = canon(con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:300]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        diff_cells = []
        for c in got.columns:
            a, b = got[c], exp[c]
            for i, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if x == y or (math.isnan(x) and math.isnan(y)):
                        continue
                    diff_cells.append((c, i, x, y, abs(x - y)))
                elif x != y:
                    diff_cells.append((c, i, x, y, None))
        if diff_cells:
            print(f"FAIL {name}: {len(diff_cells)} differing cells; first 5: {diff_cells[:5]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
