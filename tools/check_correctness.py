#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only).

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
sf parquet tables, loads the Spark result parquet, sorts columns by name
and rows by value, and compares cell-by-cell (floats to 1e-9 rel).

Usage: check_correctness.py <sfDir> <outDir>
"""
import json, math, sys, zlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

# DuckDB has no zlib, but this checker does: replay the engine's DEFLATE
# kernel (graft.functions.DeflateLen — java.util.zip.Deflater level 6,
# zlib wrapping, default strategy/memLevel) so text_compression_ratio is
# hash-checked like every other query instead of rows-only. zlib.compress
# level 6 is the same deflate configuration; agreement is verified
# row-for-row on the test corpus (ASCII text — exotic inputs could hit
# build-level zlib differences, which the float tolerance does not mask,
# so a drift FAILS loudly rather than passing silently).
con.create_function(
    "zlib_deflate_len", lambda s: len(zlib.compress(s.encode("utf-8"), 6)),
    [str], int)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Local-only oracles (Queries.localOracles): SQL the driver's fixed
# checker can't run (needs the zlib UDF above). Merged here so the
# repo-local gate hash-checks them like any other query.
try:
    oracle.update(json.load(open(f"{outdir}/oracle_sql_local.json")))
except FileNotFoundError:
    pass
# Queries that threw inside Verify (written by Verify as _failed.json).
# Surfacing these as ERR rows makes a silently-disappearing query
# impossible: r11/r12 shrank 80 -> 78 rows and no artifact said why.
try:
    verify_failed = json.load(open(f"{outdir}/_failed.json"))
except FileNotFoundError:
    verify_failed = {}
ok = fail = 0
for name, msg in sorted(verify_failed.items()):
    if name not in oracle:
        fail += 1
        print(f"ERR  {name}: verify failed: {msg}")
for name, sql in sorted(oracle.items()):
    if name in verify_failed:
        fail += 1
        print(f"ERR  {name}: verify failed: {verify_failed[name]}")
        continue
    try:
        exp = con.execute(sql).fetchdf()
        got = duckdb.connect().execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        status = []
        if list(exp.columns) != list(got.columns):
            status.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
        if len(exp) != len(got):
            status.append(f"rows exp={len(exp)} got={len(got)}")
        if not status:
            key = list(exp.columns)
            e = exp.sort_values(key, na_position="first").reset_index(drop=True)
            g = got.sort_values(key, na_position="first").reset_index(drop=True)
            mism = 0
            for c in key:
                ev, gv = e[c], g[c]
                for i in range(len(ev)):
                    a, b = ev.iloc[i], gv.iloc[i]
                    an = a is None or (isinstance(a, float) and math.isnan(a)) or str(a) == "NaT"
                    bn = b is None or (isinstance(b, float) and math.isnan(b)) or str(b) == "NaT"
                    if an and bn:
                        continue
                    if an != bn:
                        mism += 1
                        if mism < 4: status.append(f"{c}[{i}]: exp={a!r} got={b!r}")
                        continue
                    if isinstance(a, float) and isinstance(b, float):
                        if abs(a - b) > 1e-9 * max(1.0, abs(a)):
                            mism += 1
                            if mism < 4: status.append(f"{c}[{i}]: exp={a!r} got={b!r}")
                    elif str(a) != str(b):
                        mism += 1
                        if mism < 4: status.append(f"{c}[{i}]: exp={a!r} got={b!r}")
            if mism:
                status.append(f"{mism} mismatched cells")
        if status:
            fail += 1
            print(f"FAIL {name}: " + "; ".join(status[:5]))
        else:
            ok += 1
            print(f"OK   {name} ({len(exp)} rows)")
    except Exception as ex:
        fail += 1
        print(f"ERR  {name}: {ex}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
