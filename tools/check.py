#!/usr/bin/env python3
"""Local parity checker mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
  where <outDir> is what graft.Verify wrote (per-query parquet dirs +
  oracle_sql.json).

Compares each Spark result with the DuckDB result of the oracle SQL:
columns sorted by name, rows sorted, values stringified (floats via
repr of round(x, 9) to surface sub-rounding drift early).
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cat(t):
    """Arrow type category — the driver's hash is type-sensitive, so
    the mirror must distinguish everything it does, including
    timestamp unit and timezone (ts[us,UTC] vs ts[ns,None] would
    hash-mismatch even when stringified values agree)."""
    if pa.types.is_integer(t): return "int" + str(t.bit_width)
    if pa.types.is_floating(t): return "float" + str(t.bit_width)
    if pa.types.is_decimal(t): return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bin"
    if pa.types.is_date(t): return "date"
    if pa.types.is_timestamp(t): return f"ts[{t.unit},{t.tz}]"
    if pa.types.is_boolean(t): return "bool"
    return str(t)


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_of(rows, names):
    names_sorted = sorted(names)
    out = []
    for r in rows:
        d = dict(zip(names, r))
        out.append(tuple(norm(d[n]) for n in names_sorted))
    return names_sorted, sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # rows-only queries: iterate the MANIFEST, not listdir — a query
    # that threw in Verify leaves no dir and must FAIL, and stale dirs
    # from renamed queries must not count
    manifest_path = os.path.join(out_dir, "queries.json")
    all_queries = (json.load(open(manifest_path))
                   if os.path.exists(manifest_path) else [])
    for d in sorted(set(all_queries) - set(oracles)):
        qdir = os.path.join(out_dir, d)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if files and n > 0:
            print(f"PASS {d} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {d}: rows-only query {'threw (no result)' if not files else 'returned 0 rows'}")
            n_fail += 1
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0] if len(files) == 1 else res_dir)
        spark_names = tbl.column_names
        spark_rows = [tuple(d.values()) for d in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            duck_arrow = cur.arrow()
            duck_names = duck_arrow.column_names
            duck_rows = [tuple(d.values()) for d in duck_arrow.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        # the driver's hash is type-sensitive: DuckDB HUGEINT/DECIMAL vs
        # Spark BIGINT/DOUBLE mismatch even when stringified values agree
        # — so compare arrow type categories too (r01 lesson: 10 queries
        # passed stringified compare but failed the driver hash)
        stypes = {n: cat(tbl.schema.field(n).type) for n in spark_names}
        dtypes = {n: cat(duck_arrow.schema.field(n).type) for n in duck_names}
        type_mismatch = [
            (n, stypes[n], dtypes[n]) for n in stypes
            if n in dtypes and stypes[n] != dtypes[n]]
        if type_mismatch:
            print(f"FAIL {name}: arrow type mismatch {type_mismatch}")
            n_fail += 1
            continue
        sn, srows = table_of(spark_rows, spark_names)
        dn, drows = table_of(duck_rows, duck_names)
        if sn != dn:
            print(f"FAIL {name}: columns differ spark={sn} duck={dn}")
            n_fail += 1
        elif srows != drows:
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows")
            diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            extra_s = [r for r in srows if r not in set(drows)][:3]
            extra_d = [r for r in drows if r not in set(srows)][:3]
            for a, b in diffs:
                print(f"   spark={a}\n   duck ={b}")
            if extra_s: print(f"   only-spark: {extra_s}")
            if extra_d: print(f"   only-duck : {extra_d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
