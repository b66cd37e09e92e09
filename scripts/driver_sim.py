"""Simulate the driver's CORRECTNESS comparison at sf0.01."""
import hashlib
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import pandas as pd

import __spark_entry__ as e
from audience_finder_pro_spark.session import TABLES, get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def value_hash(df: pd.DataFrame) -> str:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    spark = get_spark("driver-sim", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(sql).df()
            rows = len(sdf) == len(odf)
            schema = sorted(c.lower() for c in sdf.columns) == sorted(
                c.lower() for c in odf.columns
            )
            h = value_hash(sdf) == value_hash(odf)
            status = "OK" if (rows and schema and h) else "MISMATCH"
            if status != "OK":
                bad += 1
                print(f"{name}: {status} rows={rows} schema={schema} hash={h} "
                      f"({len(sdf)} vs {len(odf)})")
        except Exception as ex:
            bad += 1
            print(f"{name}: ERR {str(ex).splitlines()[0][:160]}")
    print(f"done: {len([n for n in qs if n in oracles])} compared, {bad} bad")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
