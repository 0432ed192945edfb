"""Local replica of the driver's correctness gate: run every `queries()`
entry in Spark AND its `oracle_sql()` in DuckDB over the same sf0.01
parquet, compare row count, schema (column names), and a sorted value hash.
`python tools/correctness_check.py [sf_dir]`."""
import hashlib
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for t in canon:
        h.update("\x1f".join(t).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else
            (int(v) if isinstance(v, bool) else v) for v in r))
    return out


def main():
    from pyspark.sql import SparkSession
    import __spark_entry__ as e
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs = e.queries()
    oracles = e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        try:
            df = fn(spark, SF)
            cols = [c.lower() for c in df.columns]
            rows = norm([tuple(r) for r in df.collect()])
            if name not in oracles:
                print(f"{name:24s} rows={len(rows):6d}  (rows-only, no oracle)")
                continue
            od = con.execute(oracles[name])
            ocols = [d[0].lower() for d in od.description]
            orows = norm(od.fetchall())
            rc = len(rows) == len(orows)
            sc = sorted(cols) == sorted(ocols)
            hc = value_hash(cols, rows) == value_hash(ocols, orows)
            status = "OK " if (rc and sc and hc) else "FAIL"
            print(f"{name:24s} rows={len(rows):6d}/{len(orows):6d} "
                  f"schema={'Y' if sc else 'N'} hash={'Y' if hc else 'N'} {status}")
            if status == "FAIL":
                bad.append(name)
        except Exception as ex:
            print(f"{name:24s} ERROR {type(ex).__name__}: {str(ex)[:120]}")
            bad.append(name)
    spark.stop()
    print("FAILURES:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
