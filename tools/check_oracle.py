import sys, os, json
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import __spark_entry__ as E
from fluent_bit_clp_spark.session import get_spark

SF = "/root/testdata/sf0.01"
only = sys.argv[1:] or None

spark = get_spark(cpus=8)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable compare
    s = df.astype(str)
    rows = sorted([tuple(r) for r in s.itertuples(index=False)])
    return rows

qs = E.queries()
oracles = E.oracle_sql()
fails = []
for name, sql in oracles.items():
    if only and name not in only: continue
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.sql(sql).df()
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
        fails.append(name); continue
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        print(f"{name}: COLS MISMATCH spark={sc} oracle={oc}"); fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"{name}: ROWS {len(sdf)} vs {len(odf)}"); fails.append(name); continue
    a, b = canon(sdf), canon(odf)
    if a != b:
        diff = [(x,y) for x,y in zip(a,b) if x!=y][:3]
        print(f"{name}: VALUES MISMATCH sample={diff}"); fails.append(name); continue
    print(f"{name}: OK ({len(sdf)} rows)")
print("FAILED:", fails if fails else "none")
spark.stop()
# Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [query names...]
# Replays the driver's correctness gate locally: runs every queries()[name]
# on Spark and its oracle_sql()[name] on DuckDB over /root/testdata/sf0.01,
# comparing row count + column set + sorted stringified values.
