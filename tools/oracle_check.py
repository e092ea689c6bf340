#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB correctness gate — STRICT:
runs each oracle_sql.json query against the sf parquet tables, loads the
Spark result parquet via pyarrow (NOT duckdb: reading both sides through
one engine masks representational drift — r3-r5's profile_corr failed the
driver hash three rounds while this script, then duckdb-reading both
sides, stayed green), sorts columns by name + rows, and compares exact
canonical renderings (str for ints/decimals/strings, repr for floats).
Usage: oracle_check.py <sfDir> <verifyOutDir>
Env: ORACLE_QUERY_TIMEOUT=<sec> — interrupt any single DuckDB oracle
query running longer than this and record it as TIMEOUT (counted
separately, not as a failure): some oracles are deliberately
brute-force (all-pairs CTEs) and become DuckDB-prohibitive at larger
sf while the Spark side stays sub-second; the census documents them
as exclusions instead of hanging.
"""
import json, math, os, sys, threading
import duckdb
import pyarrow.parquet as pq

TIMEOUT = float(os.environ.get("ORACLE_QUERY_TIMEOUT", "0") or 0)
# Timeouts outside this comma-separated allowlist fail the exit code:
# the census claims zero exclusions, so an oracle silently regressing to
# DuckDB-prohibitive must turn the gate red, not print-and-pass.
TIMEOUT_ALLOW = {n.strip() for n in
                 os.environ.get("ORACLE_TIMEOUT_ALLOW", "").split(",")
                 if n.strip()}

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def connect():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


con = connect()

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


fails = ok = timeouts = bad_timeouts = 0
seen = set()
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    seen.add(name)
    try:
        tbl = pq.read_table(d)
    except Exception as e:
        print(f"X {name:24s} NO SPARK OUTPUT: {e}")
        fails += 1
        continue
    if name not in oracle:
        print(f"  {name:24s} rows-only: {tbl.num_rows} rows OK")
        continue
    # `fired` is the ONLY signal that classifies an exception as a
    # timeout: matching on the exception text would misfile a genuine
    # error mentioning INTERRUPT (or a Ctrl-C) as a non-failing timeout.
    # The callback captures the connection that runs THIS query: reading
    # the global at fire time races with the main thread reconnecting
    # after a completed query, which would latch the interrupt on the
    # fresh connection and abort the NEXT oracle instead.
    fired = []

    # default-arg capture binds the connection AT DEFINITION: reading a
    # shared name at fire time could race the main thread reconnecting
    # after a completed query (latching the interrupt on the fresh
    # connection and aborting the NEXT oracle). cancel()+join() below
    # already serializes the timer per iteration; this makes the capture
    # correct by construction rather than by that ordering.
    def _interrupt(c=con):
        fired.append(1)
        c.interrupt()

    try:
        timer = threading.Timer(TIMEOUT, _interrupt) if TIMEOUT else None
        if timer:
            timer.start()
        try:
            duck = con.sql(oracle[name])
            drows_raw = duck.fetchall()
            dcols = duck.columns
        finally:
            if timer:
                timer.cancel()
                # join makes the fired-check below authoritative: without
                # it a callback that passed the Timer's cancelled-check
                # could still be pending and interrupt the NEXT query
                timer.join()
        if fired:
            # the timer fired in the window between the query completing
            # and cancel(): a pending interrupt may be latched on the
            # shared connection and would abort the NEXT query — drop
            # the connection rather than misrecord a healthy oracle
            con = connect()
    except Exception as e:
        if fired:
            allowed = name in TIMEOUT_ALLOW
            print(f"T {name:24s} ORACLE TIMEOUT after {TIMEOUT:.0f}s "
                  f"({'allowlisted' if allowed else 'UNEXPECTED'}; Spark "
                  f"side produced {tbl.num_rows} rows)")
            timeouts += 1
            if not allowed:
                bad_timeouts += 1
            con = connect()  # clear any residual interrupt state
            continue
        print(f"X {name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    scols = tbl.column_names
    if sorted(scols) != sorted(dcols):
        print(f"X {name:24s} SCHEMA(names): spark={sorted(scols)} "
              f"duck={sorted(dcols)}")
        fails += 1
        continue
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    data = [tbl.column(i).to_pylist() for i in range(len(scols))]
    a = sorted(tuple(canon(data[i][r]) for i in sorder)
               for r in range(tbl.num_rows))
    b = sorted(tuple(canon(row[i]) for i in dorder) for row in drows_raw)
    if len(a) != len(b):
        print(f"X {name:24s} ROWS: spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    bad = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)
    if bad is not None:
        print(f"X {name:24s} VALUE row={bad}:\n"
              f"    spark={a[bad]}\n    duck ={b[bad]}")
        fails += 1
    else:
        print(f"✓ {name:24s} {len(a)} rows")
        ok += 1
# An oracle-gated entry with NO output dir means the Spark side never
# produced it (Verify caught a per-query failure) — without this check
# the census silently shrinks by one and the gate stays green. Verify
# filters oracle_sql.json under query subsets, so subset runs don't
# trip this.
for name in sorted(set(oracle) - seen):
    print(f"X {name:24s} MISSING SPARK OUTPUT (entry absent from dump)")
    fails += 1
suffix = f", {timeouts} oracle-timeout" if timeouts else ""
if bad_timeouts:
    suffix += f" ({bad_timeouts} NOT allowlisted)"
print(f"\n{ok} ok, {fails} failed{suffix}")
sys.exit(1 if fails or bad_timeouts else 0)
