#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result, run the
matching SQL from oracle_sql.json in DuckDB (tables = views over <sfDir>'s
parquet), sort columns by name, and compare row-by-row exactly (driver hashes
values, so equality must be exact — including float bits).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            duck_rel = con.sql(oracle[name])
            scols = sorted(spark_rel.columns)
            dcols = sorted(duck_rel.columns)
            if [c.lower() for c in scols] != [c.lower() for c in dcols]:
                print(f"FAIL {name}: columns spark={scols} duck={dcols}")
                n_fail += 1
                continue
            sproj = spark_rel.project(", ".join(f'"{c}"' for c in scols))
            dproj = duck_rel.project(", ".join(f'"{c}"' for c in dcols))
            stypes = [str(t) for t in sproj.types]
            dtypes = [str(t) for t in dproj.types]
            if stypes != dtypes:
                # the driver hashes TYPED values (arrow), so e.g. DuckDB's
                # HUGEINT from SUM(BIGINT) vs Spark's BIGINT is a real FAIL
                # even though Python int equality would hide it
                print(f"FAIL {name}: result types differ spark={stypes} duck={dtypes}")
                n_fail += 1
                continue
            srows = sproj.fetchall()
            drows = dproj.fetchall()
            srows = [tuple(canon(v) for v in r) for r in srows]
            drows = [tuple(canon(v) for v in r) for r in drows]
            if len(srows) != len(drows):
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
                n_fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
                print(f"  cols : {scols}")
                print(f"  spark: {a}")
                print(f"  duck : {b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
