"""Driver-style correctness harness: run each __spark_entry__ query on
Spark AND its DuckDB oracle over the same parquet tables; compare row count,
column set, and order-insensitive canonical values.

Usage: python tools/oracle_check.py [query ...]   (default: all)
       SF dir via $SPARK_GRAFT_ORACLE_SF (default /root/testdata/sf0.01)
"""

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    cols_sorted = sorted(cols)
    out = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(zip(cols, r))
        vals = []
        for c in cols_sorted:
            v = d[c]
            if isinstance(v, float):
                v = f"{v:.10g}"
            elif isinstance(v, bool):
                v = str(v).lower()
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "10g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failures = 0

    for name in only:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        tsp = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only check, rows={len(srows)} ({tsp:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        s_can, d_can = canon(srows, scols), canon(drows, dcols)
        ok = ok_cols and len(srows) == len(drows) and s_can == d_can
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} spark={len(srows)} duck={len(drows)} "
            f"cols={ok_cols} ({tsp:.1f}s)"
        )
        if not ok:
            failures += 1
            if not ok_cols:
                print("  spark cols:", sorted(scols), " duck cols:", sorted(dcols))
            sset, dset = set(s_can), set(d_can)
            for x in list(sset - dset)[:3]:
                print("  spark-only:", x[:160])
            for x in list(dset - sset)[:3]:
                print("  duck-only: ", x[:160])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
