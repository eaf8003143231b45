#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<query>/ parquet (Spark output) and oracle_sql.json,
runs each oracle against the testdata parquet in DuckDB, and compares
row counts, column names, and value multisets (doubles rounded to 9 sig
figs before hashing to tolerate summation-order noise far below our
explicit round()s).

Type-faithful: the DuckDB side is fetched via fetch_arrow_table(), the
same path the driver's hasher uses, and any decimal/hugeint column in an
oracle result is an immediate FAIL — Spark never emits one, so such a
column (e.g. an uncast DuckDB window sum(), which widens BIGINT →
HUGEINT → Arrow decimal128) would hash-mismatch at the driver even when
fetchall()'s int coercion makes the values look equal locally.
"""
import json, sys, glob, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        scols = [c.lower() for c in spark_tbl.column_names]
        srows = [tuple(r[c] for c in spark_tbl.column_names)
                 for r in spark_tbl.to_pylist()]
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
            dcols = [c.lower() for c in duck_tbl.column_names]
            drows = [tuple(r[c] for c in duck_tbl.column_names)
                     for r in duck_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        bad_types = [
            (f.name, str(f.type)) for f in duck_tbl.schema
            if pa.types.is_decimal(f.type) or str(f.type) == "int128"]
        if bad_types:
            print(f"FAIL {name}: oracle emits decimal/hugeint columns "
                  f"{bad_types} — Spark never does; CAST them (AS BIGINT)")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        sk = rows_key(scols, srows)
        dk = rows_key(dcols, drows)
        if sk != dk:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(pq.read_table(f).num_rows for f in files) if files else 0
        print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
