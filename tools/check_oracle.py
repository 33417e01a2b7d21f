#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sfDir tables registered
as views, sorts columns by name, and compares row-by-row hashes.

Type-aware (round 10): also compares DuckDB's result-column TYPES against
the Spark parquet schema. DuckDB types integer sum() as HUGEINT (int128)
and decimal arithmetic as DECIMAL; Spark emits BIGINT/DOUBLE. The driver's
hash gate sees the type difference even when repr() of the Python values
matches, so a value-blind comparison here ships red gates (d60/d73/d80 in
round 9). Any oracle column typed HUGEINT, or typed DECIMAL where Spark
says DOUBLE/FLOAT, is a FAIL here regardless of values.
"""
import json, sys, glob, os
import duckdb

# Oracle-side types the driver's hasher canonicalizes differently than the
# BIGINT/DOUBLE Spark writes. Pairing one of these with the Spark type on
# the right is the exact bug class that shipped d60/d73/d80 red in round 9.
def type_defect(spark_t, oracle_t):
    s, o = spark_t.upper(), oracle_t.upper()
    if o in ("HUGEINT", "INT128", "UHUGEINT") and s != o:
        return True
    if o.startswith("DECIMAL") and s in ("DOUBLE", "FLOAT", "REAL"):
        return True
    return False

def canon(rows, cols):
    """Sort columns by name, stringify values deterministically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def register_views(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def lint(sf_dir, out_dir):
    """Bind (don't run) every oracle; fail on any HUGEINT/DECIMAL output
    column. Spark cannot emit those types, so any such column is a
    guaranteed driver hash_match failure waiting to ship."""
    con = duckdb.connect()
    register_views(con, sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(f"DESCRIBE {oracle[name]}")
            cols = rel.fetchall()  # (column_name, column_type, ...)
        except Exception as e:
            print(f"  {name}: LINT-BIND-ERROR {e}")
            n_bad += 1
            continue
        bad = [f"{c[0]}:{c[1]}" for c in cols
               if c[1].upper() in ("HUGEINT", "INT128", "UHUGEINT")
               or c[1].upper().startswith("DECIMAL")]
        if bad:
            n_bad += 1
            print(f"  {name}: LINT-TYPE {' '.join(bad)} "
                  f"(cast integer sums: CAST(sum(..) AS BIGINT))")
    print(f"== lint: {n_bad} oracle(s) with Spark-unrepresentable "
          f"output types ==")
    return 1 if n_bad else 0


def run_oracle(con, sql, timeout=None):
    """Execute one oracle, optionally under a wall-clock budget
    (con.interrupt() from a timer thread -> duckdb.InterruptException)."""
    if not timeout:
        rel = con.sql(sql)
        return list(rel.columns), [str(t) for t in rel.types], rel.fetchall()
    import threading
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        rel = con.sql(sql)
        return list(rel.columns), [str(t) for t in rel.types], rel.fetchall()
    finally:
        timer.cancel()


def main(sf_dir, out_dir, json_out=None, timeout=None):
    con = duckdb.connect()
    register_views(con, sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_timeout = 0
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        grel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = list(grel.columns)
        got_types = [str(t) for t in grel.types]
        got_rows = grel.fetchall()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got_rows)} "
                  f"{'ok' if got_rows else 'EMPTY!'}", flush=True)
            results[name] = {"status": "NO-ORACLE", "rows": len(got_rows)}
            continue
        try:
            exp_cols, exp_types, exp_rows = run_oracle(
                con, oracle[name], timeout)
        except duckdb.InterruptException:
            n_timeout += 1
            print(f"  {name}: TIMEOUT oracle exceeded {timeout}s "
                  f"(principled exclusion, not a mismatch)", flush=True)
            results[name] = {"status": "TIMEOUT", "budget_sec": timeout}
            continue
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}", flush=True)
            results[name] = {"status": "ORACLE-SQL-ERROR"}
            n_fail += 1
            continue
        spark_t = dict(zip(got_cols, got_types))
        bad_types = [
            f"{c}: spark={spark_t.get(c, '?')} oracle={t}"
            for c, t in zip(exp_cols, exp_types)
            if c in spark_t and type_defect(spark_t[c], t)]
        if bad_types:
            n_fail += 1
            print(f"  {name}: TYPE-MISMATCH {'; '.join(bad_types)}")
            results[name] = {"status": "TYPE-MISMATCH"}
            continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  {name}: SCHEMA-MISMATCH spark={gc} oracle={ec}")
            results[name] = {"status": "SCHEMA-MISMATCH"}
            n_fail += 1
        elif g != e:
            n_fail += 1
            results[name] = {"status": "HASH-MISMATCH",
                             "rows_spark": len(g), "rows_oracle": len(e)}
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
            results[name] = {"status": "PASS", "rows": len(g)}
            print(f"  {name}: PASS rows={len(g)}", flush=True)
    tail = f", {n_timeout} timeout" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{tail} ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_timeout": n_timeout,
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0

USAGE = ("usage: check_oracle.py <sf_dir> <verify_out_dir> "
         "[--json OUT.json] [--timeout SEC] [--lint]")

def _flag_value(args, flag):
    if flag not in args:
        return args, None
    i = args.index(flag)
    if i + 1 >= len(args):
        sys.exit(USAGE)
    v = args[i + 1]
    return args[:i] + args[i + 2:], v

if __name__ == "__main__":
    if "--lint" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--lint"]
        sys.exit(lint(args[0], args[1]))
    args = sys.argv[1:]
    args, jout = _flag_value(args, "--json")
    args, tmo = _flag_value(args, "--timeout")
    if len(args) < 2:
        sys.exit(USAGE)
    sys.exit(main(args[0], args[1], jout, float(tmo) if tmo else None))
