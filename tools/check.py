#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (t2 gate).

Loads each <outDir>/<name> parquet produced by graft.Verify, runs the
paired oracle SQL from oracle_sql.json in DuckDB over the same sfDir
tables, sorts columns by name and rows by value, and compares cell by
cell (strict — if this passes, any hash-based compare passes).
Dev tooling only; the shipped engine is pure Scala/Spark.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def type_family(t):
    """Coarse physical-type family of a DuckDB column type.

    The driver's compare goes through pandas/arrow, where e.g. a
    DuckDB HUGEINT (the result type of sum(BIGINT)) renders as
    decimal128/float64 and hash-mismatches a Spark int64 even when
    every value is equal. fetchall() hides that (HUGEINT -> int), so
    we check declared types separately from cell values.
    """
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("HUGEINT", "UHUGEINT") or s.startswith("DECIMAL"):
        return "decimal"
    if s in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if s.startswith("VARCHAR") or s == "TEXT":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "BLOB":
        return "bytes"
    if s.endswith("[]"):
        # recurse into the element type: DOUBLE[] vs BIGINT[] is the
        # same class of drift this gate exists to catch
        return "list<" + type_family(s[:-2]) + ">"
    if s.startswith("LIST(") and s.endswith(")"):
        return "list<" + type_family(s[5:-1]) + ">"
    if s.startswith("LIST"):
        return "list"
    return s


def table_to_rows(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    fams = [type_family(t) for t in rel.types]
    rows = rel.fetchall()
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], [fams[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures, passes, rows_only = [], [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = len(got_rel.fetchall())
            rows_only.append((name, n))
            status = "ROWS-ONLY" if n > 0 else "EMPTY!"
            print(f"[{status:9s}] {name}: {n} rows")
            continue
        gcols, gfams, got = table_to_rows(got_rel)
        try:
            ecols, efams, exp = table_to_rows(con.sql(oracle[name]))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            continue
        if gcols != ecols:
            failures.append(name)
            print(f"[FAIL] {name}: columns differ spark={gcols} duckdb={ecols}")
            continue
        if gfams != efams:
            failures.append(name)
            mism = [(c, g, e) for c, g, e in zip(gcols, gfams, efams) if g != e]
            print(f"[FAIL] {name}: column type families differ: {mism}")
            continue
        if got != exp:
            failures.append(name)
            print(f"[FAIL] {name}: {len(got)} vs {len(exp)} rows")
            bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            for g, e in bad:
                print(f"   spark : {g}\n   duckdb: {e}")
            if len(got) != len(exp):
                sg, se = set(got), set(exp)
                for r in list(sg - se)[:3]:
                    print(f"   only-spark : {r}")
                for r in list(se - sg)[:3]:
                    print(f"   only-duckdb: {r}")
        else:
            passes.append(name)
            print(f"[PASS] {name}: {len(got)} rows")
    missing = sorted(set(oracle) - set(names))
    for name in missing:
        failures.append(name)
        print(f"[FAIL] {name}: declared oracle but no Verify output (query crashed?)")
    print(f"\n{len(passes)} pass, {len(failures)} fail, {len(rows_only)} rows-only")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
