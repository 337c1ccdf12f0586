#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
written by graft.Verify into OUTDIR/<name>/ (parquet) plus
OUTDIR/oracle_sql.json, run the oracle SQL in DuckDB over the sf tables
and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb

def canon(rel):
    """Return (colnames_sorted, rows) with rows sorted for order-insensitive compare."""
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    # canonicalize values to strings for robust compare
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # bound the oracle engine and let it spill: the 30x rehearsal's
    # biggest oracle (a ~700M-row binned interval join) OOM-killed an
    # unbounded in-memory run; with a limit + temp dir DuckDB goes
    # out-of-core instead of dying
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    # ~75% of physical RAM (hardcoding a constant only bounds DuckDB
    # on boxes bigger than the constant); overridable for odd hosts
    mem_gb = os.environ.get("GRAFT_ORACLE_MEM_GB")
    if not mem_gb:
        page = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        mem_gb = str(max(2, int(page * 0.75 / 2**30)))
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        # driver layout: one parquet file; ScaleUp layout: a directory
        # of Spark-written part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        if t == "events":
            # ScaleUp stores ts as BIGINT nanos (the driver layout is
            # TIMESTAMP(NANOS)); canonicalize exactly like
            # Tables.events: timestamp_micros(ts div 1000)
            ts_type = next(r[1] for r in
                           con.execute("DESCRIBE events").fetchall()
                           if r[0] == "ts")
            if ts_type == "BIGINT":
                con.execute("CREATE OR REPLACE VIEW events AS "
                            f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    # a registered query with NO output dir is a FAIL, not a removal:
    # Verify leaves an _ERROR marker on throw, but belt-and-braces —
    # a crash before the marker (or a deleted builder) must still fail
    vanished = [n for n in sorted(oracle) if n not in names
                and (not only or n in only)]
    for name in vanished:
        print(f"FAIL {name}: registered (oracle present) but no output "
              f"written — query vanished"); n_fail += 1
    if vanished:
        print(f"{len(vanished)} registered-but-unreported queries")
    for name in names:
        if only and name not in only:
            continue
        err = os.path.join(out_dir, name, "_ERROR")
        if os.path.exists(err):
            msg = open(err).read().strip().splitlines()
            print(f"FAIL {name}: query threw: {msg[0] if msg else '?'}")
            n_fail += 1; continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
        try:
            want = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        # big results (scale rehearsals): materializing rows in Python
        # is the bottleneck, not DuckDB — compare multisets in-engine
        # with count(*) + an order-independent sum of row hashes over
        # name-sorted columns (exactly the strictness of the row
        # compare below, minus the per-row diff printout). Gate on the
        # LARGER side, counted in-engine: a small/empty engine result
        # against a huge oracle (a real failure shape) must not fall
        # through to canon(want) and materialize the oracle in Python.
        n_got = got.aggregate("count(*)").fetchone()[0]
        n_want = want.aggregate("count(*)").fetchone()[0]
        if max(n_got, n_want) > 200_000:
            gc = sorted(got.columns)
            wc = sorted(want.columns)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
            proj = ", ".join(f'"{c}"' for c in gc)
            agg = f"count(*) AS n, sum(hash({proj})) AS h"
            gn, gh = got.aggregate(agg).fetchone()
            wn, wh = want.aggregate(agg).fetchone()
            if (gn, gh) != (wn, wh):
                print(f"FAIL {name}: multiset mismatch "
                      f"(rows {gn} vs {wn}, hashsum {gh} vs {wh})")
                n_fail += 1; continue
            print(f"PASS {name} ({gn} rows, in-engine hash)"); n_pass += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(wr)}"); n_fail += 1
            for a in gr[:3]: print("   got :", a)
            for b in wr[:3]: print("   want:", b)
            continue
        if gr != wr:
            bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g.:")
            for a, b in bad:
                print("   got :", a)
                print("   want:", b)
            n_fail += 1
            continue
        if len(gr) == 0:
            print(f"WARN {name}: matches but EMPTY result")
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
