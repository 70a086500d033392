"""Side-by-side Spark vs DuckDB check of every declared query — a local
replica of the driver's correctness gate (row-count + schema + sorted
value comparison). Run directly:  python tests/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        problems.append(f"schema spark={s_cols} duck={d_cols}")
        return problems
    s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
    for c in s_cols:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(np.float64)
            dv = dv.astype(np.float64)
            # Half-ulp-of-the-rounding-unit tolerance: queries pin round(x, k)
            # in the SQL text (k >= 3), so values differing by < 5e-7 are the
            # same rounded number accumulated in a different order.  NaN==NaN
            # counts as equal (ADVICE r1).
            mism = ~(np.isclose(sv, dv, rtol=0.0, atol=5e-7) | (np.isnan(sv) & np.isnan(dv)))
            if mism.any():
                bad = np.where(mism)[0][:3]
                problems.append(
                    f"col {c}: {int(mism.sum())} mismatches, first {[(sv[i], dv[i]) for i in bad]}"
                )
        elif not (sv == dv).all():
            problems.append(f"col {c}: value mismatch (non-float)")
    return problems


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    # Deliberately a VANILLA session — zero repo-specific configs — so this
    # harness reproduces the driver's environment (VERDICT r1 #2: building it
    # via get_spark() masked the nanosAsLong session-coupling bug).
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    con = duckdb.connect()
    for t in e.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name in sorted(qs):
        # per-query isolation: one regressed/crashing query must not
        # abort the gate and hide the state of everything after it
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name:28s} rows={len(sdf):6d}  (no oracle — rows-only check)")
                continue
            ddf = con.sql(oracles[name]).df()
            problems = compare(name, sdf, ddf)
        except Exception as exc:  # noqa: BLE001 - gate harness
            problems = [f"EXCEPTION {type(exc).__name__}: {exc}"[:300]]
            sdf = []
        status = "OK " if not problems else "FAIL"
        n_fail += bool(problems)
        print(f"{name:28s} {status} rows={len(sdf):6d} {problems if problems else ''}")
    print(f"\n{n_fail} failures / {len(qs)} queries")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
