#!/usr/bin/env python3
"""Self-check harness emulating the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
Loads oracle_sql.json, registers views for each table over the sf dir,
runs each oracle in DuckDB, reads our parquet result, canonicalizes
(columns sorted by name, rows sorted by all columns) and diffs.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted(rows, key=key)

def norm(v):
    # Type-strict: no Decimal->float collapse (a DuckDB HUGEINT/DECIMAL vs
    # Spark BIGINT/DOUBLE divergence must FAIL here, like the driver's
    # type-sensitive hash). Only NaN needs canonicalizing (NaN != NaN).
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def result_types(con, rel_sql):
    """name.lower() -> DuckDB type string for a query's result schema."""
    rows = con.execute(f"DESCRIBE {rel_sql}").fetchall()
    return {r[0].lower(): r[1] for r in rows}

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            want_rel = con.execute(sql)
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        try:
            gt = result_types(con, f"SELECT * FROM read_parquet({files!r})")
            wt = result_types(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: describe error {e}")
            n_fail += 1
            continue
        type_mismatch = {c: (gt[c], wt[c]) for c in gt if gt[c] != wt.get(c)}
        if type_mismatch:
            print(f"FAIL {name}: result types diverge {type_mismatch}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols, key=str.lower)]
        wi = [want_cols.index(c) for c in sorted(want_cols, key=str.lower)]
        g = canon([tuple(norm(r[i]) for i in gi) for r in got])
        w = canon([tuple(norm(r[i]) for i in wi) for r in want])
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            for a, b in list(zip(g, w))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            if len(g) != len(w):
                sg, sw = set(g), set(w)
                only_g = list(sg - sw)[:3]
                only_w = list(sw - sg)[:3]
                print(f"  only-spark: {only_g}\n  only-duck : {only_w}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
