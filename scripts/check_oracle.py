#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate locally.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads every fixture parquet as a DuckDB view, runs each oracle SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet written by graft.Verify — columns sorted by name, rows sorted,
exact value equality AND exact column-type equality (the driver's hash
is type-sensitive: a DuckDB HUGEINT vs Spark BIGINT mismatch fails the
driver even when every value repr-matches — the q12 escape).

This is developer tooling only; the shipped library is pure Scala/Spark.
"""
import duckdb, glob, json, math, os, sys

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).split(".")[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        res_glob = f"{outdir}/{name}/*.parquet"
        if not glob.glob(res_glob):
            print(f"MISSING  {name} (no spark result)")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{res_glob}'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"SCHEMA   {name}: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        # type-sensitive compare: DESCRIBE both sides through DuckDB so the
        # same type system names both (catches HUGEINT-vs-BIGINT etc. that
        # repr-level value compare cannot). Calibrated to the driver's
        # observed behavior: plain integer widths are one equivalence
        # class (Spark row_number INTEGER vs DuckDB BIGINT passes the
        # driver), HUGEINT is NOT (its pandas conversion goes through
        # float — the q12 escape), and any other family difference flags.
        def tclass(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER",
                                  "BIGINT") else t
        try:
            exp_t = {r[0]: tclass(r[1])
                     for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            got_t = {r[0]: tclass(r[1]) for r in
                     con.execute(f"DESCRIBE SELECT * FROM '{res_glob}'").fetchall()}
        except Exception as e:
            print(f"DESC-ERR {name}: {e}")
            n_fail += 1
            continue
        mism = {c: (got_t.get(c), exp_t.get(c)) for c in exp_t
                if got_t.get(c) != exp_t.get(c)}
        if mism:
            print(f"TYPES    {name}: spark-vs-oracle {mism}")
            n_fail += 1
            continue
        # HARD RULE: any final-schema DECIMAL (either side, any
        # precision) is driver-hazardous — the driver's pandas-path
        # decimal conversion hashes differently from Spark's parquet
        # decimal even at equal values (the q12/psi escape class).
        # Cast your gate projection to BIGINT/DOUBLE/VARCHAR.
        dec_cols = sorted({c for c, t in list(exp_t.items()) +
                           list(got_t.items())
                           if t.startswith("DECIMAL")})
        if dec_cols:
            print(f"DECIMAL  {name}: final-schema decimal columns "
                  f"{dec_cols} — cast your gate projection to "
                  f"BIGINT/DOUBLE/VARCHAR on both sides")
            n_fail += 1
            continue
        g, cols = norm(got_rows, got_cols)
        e, _ = norm(exp_rows, exp_cols)
        if len(g) != len(e):
            print(f"ROWS     {name}: spark={len(g)} oracle={len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"VALUES   {name}: first diff row {bad} cols={cols}")
            print(f"  spark : {g[bad]}")
            print(f"  oracle: {e[bad]}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
