#!/usr/bin/env python3
"""Dev harness mirroring the driver's DuckDB-oracle correctness gate.

NOT part of the shipped Scala library — local pre-validation only.
Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB against the fixture
tables, then compares: columns sorted by name, rows sorted by all
columns, values compared exactly (floats bit-exact, tiny-ulp fallback
reported separately).
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if name not in oracle:
            skipped.append(name)
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(oracle[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            failed.append((name, f"EXEC: {e}"))
            continue
        # The driver's hash harness renders DuckDB HUGEINT differently
        # from Spark's BIGINT even when values agree (round-6 lesson:
        # an uncast sum(BIGINT) output column is a guaranteed driver
        # hash-mismatch that this fetchall-based gate would miss).
        try:
            tys = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            huge = [c for c, t, *_ in tys if "HUGEINT" in t.upper()]
            if huge:
                failed.append((name, f"TYPE: HUGEINT oracle output cols {huge} "
                                     f"(wrap in CAST(... AS BIGINT))"))
                continue
        except Exception:
            pass
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        if gc != wc:
            failed.append((name, f"COLS: got {gc} want {wc}"))
            continue
        if len(g) != len(w):
            failed.append((name, f"ROWS: got {len(g)} want {len(w)}"))
            continue
        bad = None
        for i, (gr, wr) in enumerate(zip(g, w)):
            if not all(eq(a, b) for a, b in zip(gr, wr)):
                bad = (i, gr, wr)
                break
        if bad:
            failed.append((name, f"VAL@{bad[0]}: got {bad[1][:6]} want {bad[2][:6]}"))
        else:
            passed.append(name)
    print(f"PASS {len(passed)}: {' '.join(passed)}")
    if skipped:
        print(f"SKIP (no oracle) {len(skipped)}: {' '.join(skipped)}")
    if failed:
        print(f"FAIL {len(failed)}:")
        for n, msg in failed:
            print(f"  {n}: {msg}")
        sys.exit(1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
