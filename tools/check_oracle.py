#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sfDir tables registered
as views, sorts columns by name, and compares row-by-row hashes.
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    """Sort columns by name, stringify values deterministically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        res = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [d[0] for d in res.description]
        got_rows = res.fetchall()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got_rows)} "
                  f"{'ok' if got_rows else 'EMPTY!'}")
            continue
        try:
            ores = con.execute(oracle[name])
            exp_cols = [d[0] for d in ores.description]
            exp_rows = ores.fetchall()
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  {name}: SCHEMA-MISMATCH spark={gc} oracle={ec}")
            n_fail += 1
        elif g != e:
            n_fail += 1
            print(f"  {name}: HASH-MISMATCH rows spark={len(g)} oracle={len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      oracle={b}")
                    break
            if len(g) != len(e):
                only_g = set(g) - set(e)
                only_e = set(e) - set(g)
                for r in list(only_g)[:2]: print(f"    only-spark: {r}")
                for r in list(only_e)[:2]: print(f"    only-oracle: {r}")
        else:
            n_pass += 1
            print(f"  {name}: PASS rows={len(g)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
