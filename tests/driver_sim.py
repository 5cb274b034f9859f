"""Simulate the round driver: smoke entry(), then oracle-compare every
queries() entry at sf0.01 exactly like CORRECTNESS_r{N}.json."""
import sys, math, time
sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- entry smoke (driver does this at sf0.001) ---
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

# --- correctness gate at sf0.01 ---
SF = "/root/testdata/sf0.01"
qs = E.queries()
oracles = E.oracle_sql()
assert set(oracles) <= set(qs), "oracle keys not subset of queries"
print(f"{len(qs)} queries, {len(oracles)} with oracles")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(rows, cols):
    """Mirror of the round driver's pandas-based canonicalizer.

    The real driver builds a DataFrame and `sort_values` across all
    columns (object columns go through `Categorical` → factorize →
    hashing), so any unhashable surface type — bytearray from a Spark
    `binary` column was the CORRECTNESS_r04 crash — must raise HERE,
    in local runs, not first at the round gate. Do not swap this back
    to the old tuple sort: tuples hash bytes fine and hide the hazard.
    """
    import pandas as pd

    df = pd.DataFrame(rows, columns=cols)
    df = df[sorted(df.columns)]
    if len(df):
        # sort_values on object dtype goes through Categorical →
        # PyObjectHashTable.factorize — unhashable cells raise TypeError,
        # exactly like the driver.
        df = df.sort_values(by=list(df.columns), kind="mergesort")

    def norm(v):
        if isinstance(v, float) and math.isnan(v): return "NaN"
        return v

    return [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]

fails = []
for name in sorted(qs):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        status = f"rows={len(srows)}"
        if name in oracles:
            # Type lint: the external driver hashes values by serialized
            # type, so a DuckDB HUGEINT (SUM over integers widens) or a
            # DECIMAL column where Spark produces DOUBLE hash-mismatches
            # even when every value compares equal in Python. Catch the
            # class here, before the round gate does.
            sdt = dict(sdf.dtypes)
            for dcol, dtyp, *_ in con.execute(
                "DESCRIBE " + oracles[name]
            ).fetchall():
                dt, st = dtyp.upper(), sdt.get(dcol, "")
                if "HUGEINT" in dt:
                    fails.append((name, f"oracle col {dcol} is HUGEINT — CAST the SUM to BIGINT (bsum_sql)"))
                    status = "TYPE-LINT"
                elif dt.startswith("DECIMAL") and st == "double":
                    fails.append((name, f"oracle col {dcol} is {dtyp} but Spark emits double — cast to DOUBLE (dsum_sql)"))
                    status = "TYPE-LINT"
                elif dt in ("INTEGER", "SMALLINT", "TINYINT") and st == "bigint":
                    fails.append((name, f"oracle col {dcol} is {dtyp} but Spark emits bigint"))
                    status = "TYPE-LINT"
                # reverse-direction hazards (the lint was one-way):
                # Spark decimal serializes as Decimal('1.500000') vs the
                # oracle's 1.5, and float32 reprs diverge from float64
                # (0.1 -> 0.10000000149...) — both hash-mismatch at the
                # gate even though Python == compares true. Plain
                # int-width mismatches (int vs BIGINT) stay benign: the
                # serialized integer text is identical.
                elif dt in ("DOUBLE", "FLOAT") and st.startswith("decimal"):
                    fails.append((name, f"oracle col {dcol} is {dtyp} but Spark emits {st} — cast the Spark side to DOUBLE"))
                    status = "TYPE-LINT"
                elif dt == "DOUBLE" and st == "float":
                    fails.append((name, f"oracle col {dcol} is DOUBLE but Spark emits float32 — cast to DOUBLE (reprs diverge)"))
                    status = "TYPE-LINT"
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
            if sorted(scols) != sorted(dcols):
                fails.append((name, f"cols {sorted(scols)} vs {sorted(dcols)}")); status="COLS-MISMATCH"
            elif len(srows) != len(drows):
                fails.append((name, f"rowcount {len(srows)} vs {len(drows)}")); status="COUNT-MISMATCH"
            else:
                s, d = canon(srows, scols), canon(drows, dcols)
                bad = sum(1 for a, b in zip(s, d) if a != b)
                if bad: fails.append((name, f"{bad} value mismatches")); status=f"VALUE-MISMATCH({bad})"
                else: status += " MATCH"
        print(f"  {name:32s} {status:24s} {time.time()-t0:5.1f}s")
    except Exception as ex:
        fails.append((name, str(ex)[:200])); print(f"  {name:32s} ERROR {str(ex)[:120]}")

print("RESULT:", "FAIL " + repr(fails) if fails else "ALL MATCH")
sys.exit(1 if fails else 0)
