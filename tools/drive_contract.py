"""Driver-sim: exercises __spark_entry__ exactly as the round driver would —
vanilla SparkSession (no engine-tuned configs), entry() smoke at sf0.001,
then every queries() entry at sf0.01 compared against oracle_sql() in DuckDB.
"""
import importlib.util, math, sys, time

import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("spark_entry", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

# vanilla driver-style session: note NO nanosAsLong, NO UTC tz override here
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.columns}")
for r in rows[:3]:
    print("  ", tuple(r))
assert len(rows) > 0

conn = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v + 0.0
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

qs, oracles = mod.queries(), mod.oracle_sql()
# optional argv filter: `python tools/drive_contract.py j10 dq1` runs only
# queries whose name contains one of the given substrings
if len(sys.argv) > 1:
    pats = sys.argv[1:]
    qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        srows = sorted((tuple(norm(v) for v in r) for r in sdf.collect()),
                       key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
        if name in oracles:
            res = conn.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = sorted((tuple(norm(v) for v in r) for r in res.fetchall()),
                           key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
            ok = (sdf.columns == dcols) and (srows == drows)
            status = "MATCH" if ok else "MISMATCH"
            if not ok: fails.append(name)
        else:
            status = f"ROWS-ONLY({len(srows)})"
        print(f"{status:14s} {name:40s} rows={len(srows):6d} {time.time()-t0:5.1f}s")
    except Exception as e:
        fails.append(name)
        print(f"ERROR          {name:40s} {type(e).__name__}: {str(e)[:120]}")
print(f"\n{len(qs)} queries, {len(oracles)} with oracle, failures: {fails or 'none'}")
sys.exit(1 if fails else 0)
