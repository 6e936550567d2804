"""Local mirror of the driver's t2 oracle gate.

Usage:
    python tools/t2.py [query ...]           # default: all oracle-backed queries
    SF=/root/testdata/sf0.01 python tools/t2.py q5_local_supplier

Runs each named query's Spark plan and DuckDB oracle side by side with the
driver's canonicalization (columns sorted by name, floats rounded to 6,
stringified, rows sorted) and prints MATCH/MISMATCH plus wall time for each
side — the timing is the feedback loop for the driver-budget question.
"""

import math
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E  # noqa: E402
from plenario_mapper_spark.plans.registry import release_query_caches  # noqa: E402

SF = os.environ.get("SF", "/root/testdata/sf0.01")
CPUS = os.environ.get("CPUS", "8")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(
            tuple(
                (
                    "NaN"
                    if isinstance(r[i], float) and math.isnan(r[i])
                    else str(round(r[i], 6))
                    if isinstance(r[i], float)
                    else str(r[i])
                )
                for i in order
            )
        )
    return sorted(out)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs, osql = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        t0 = time.monotonic()
        df = qs[name](spark, SF)
        cols = df.columns
        got = canon([[r[c] for c in cols] for r in df.collect()], cols)
        t_spark = time.monotonic() - t0
        if osql.get(name):
            t0 = time.monotonic()
            o = con.execute(osql[name])
            want = canon(o.fetchall(), [d[0] for d in o.description])
            t_oracle = time.monotonic() - t0
            ok = got == want
            bad += not ok
            print(
                f"{name:36s} {'MATCH' if ok else 'MISMATCH':8s} "
                f"rows={len(got):6d} spark={t_spark:6.2f}s duck={t_oracle:6.2f}s"
            )
            if not ok:
                only_g = [r for r in got if r not in set(map(tuple, want))][:3]
                only_w = [r for r in want if r not in set(map(tuple, got))][:3]
                print("  spark-only:", only_g)
                print("  oracle-only:", only_w)
        else:
            print(f"{name:36s} {'ROWS-ONLY':8s} rows={len(got):6d} spark={t_spark:6.2f}s")
        # Bound cache lifetime exactly like bench.py: the registry's own
        # persists accumulate across a 200+ query sweep and eventually
        # overflow the default local-mode driver heap (observed at ~208
        # queries). Released AFTER the timed section, so per-query walls
        # are unchanged.
        release_query_caches(spark)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
