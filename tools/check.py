#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: python3 check.py [sfDir] [verifyOutDir] [name-prefix ...]

Run `graft.Verify` first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then this script replays each oracle_sql.json entry in DuckDB over the
same parquet tables and compares rows / schema (sorted column names,
type-class parity, single-schema agreement across part files) / value
hash (rows sorted, floats compared EXACTLY via repr — the graft.Dets
decimal convention makes results bit-identical, so any float drift is
a real engine divergence, and the driver's hash is dtype-exact too).
On a hash mismatch the first few differing canonical rows per side are
printed. Queries without an oracle entry get the driver's weaker
rows>0 check. Dev tool only — the driver runs its own compare.
"""
import duckdb, json, sys, hashlib, math, os, datetime

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
prefixes = sys.argv[3:]

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


def norm(v):
    if v is None:
        return "NULL"
    # DATE vs midnight-TIMESTAMP are the same value across engines
    # (Spark date_trunc returns timestamp, DuckDB's returns date)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat() + " 00:00:00"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: repr round-trips IEEE doubles
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


def canon(lines):
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def diff_preview(slines, olines, n=3):
    """First n canonical rows present on one side only (sorted lists)."""
    sset, oset = set(slines), set(olines)
    s_only = [l for l in slines if l not in oset][:n]
    o_only = [l for l in olines if l not in sset][:n]
    return s_only, o_only


fails = 0
dumped = sorted(d for d in os.listdir(out)
                if os.path.isdir(os.path.join(out, d)))

# Round-9 lesson: a query that errors in Verify leaves no dumped dir and
# silently vanishes from this loop. Verify now writes errors.json; surface
# every entry as a first-class FAIL, and (when no prefix filter narrows the
# run) fail any oracle entry with no dumped dir at all, so dumped-set drift
# can never read as green.
err_path = os.path.join(out, "errors.json")
errored = json.load(open(err_path)) if os.path.exists(err_path) else {}
for name, msg in sorted(errored.items()):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    print(f"{name}: FAIL verify error: {msg[:200]}")
    fails += 1
if not prefixes:
    for name in sorted(set(oracle) - set(dumped) - set(errored)):
        print(f"{name}: FAIL oracle entry has no dumped result dir")
        fails += 1
for name in dumped:
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    try:
        srel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols, stypes = srel.columns, [str(t) for t in srel.types]
        srows = srel.fetchall()
        # every part file must agree on ONE schema — the driver reads
        # the directory as a unit and a mixed-schema write is a bug even
        # when the union happens to scan
        parts = [f for f in os.listdir(f"{out}/{name}")
                 if f.endswith(".parquet")]
        schemas = set()
        for f in parts:
            prel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/{f}') LIMIT 0")
            schemas.add(tuple(zip(prel.columns, [str(t) for t in prel.types])))
        if len(schemas) > 1:
            print(f"{name}: FAIL part files disagree on schema: {schemas}")
            fails += 1
            continue
    except Exception as e:
        print(f"{name}: SPARK-READ ERR {e}")
        fails += 1
        continue
    if name not in oracle:
        ok = len(srows) > 0
        if not ok:
            fails += 1
        print(f"{name}: {'NO-ORACLE rows>0 OK' if ok else 'FAIL empty'} "
              f"rows={len(srows)}")
        continue
    nested = [c for c, t in zip(scols, stypes)
              if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
    if nested:
        print(f"{name}: FAIL nested output columns the driver cannot "
              f"row-sort: {nested}")
        fails += 1
        continue
    try:
        orel = con.sql(oracle[name])
        ocols, otypes = orel.columns, [str(t) for t in orel.types]
        orows = orel.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fails += 1
        continue
    rows_ok = len(srows) == len(orows)
    schema_ok = sorted(scols) == sorted(ocols)
    # type-CLASS parity by column name (decimal != double != int !=
    # hugeint): a DuckDB HUGEINT/DECIMAL result vs a Spark BIGINT/DOUBLE
    # stringifies alike here yet diverges under the driver's dtype-aware
    # hash — catch it locally. DATE vs midnight-TIMESTAMP is allowed
    # (one class), matching norm() and the driver.
    def tclass(t):
        if t.startswith("DECIMAL"):
            return "decimal"
        if t == "HUGEINT":
            return "hugeint"  # force explicit CASTs on DuckDB sums
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if t in ("FLOAT", "DOUBLE"):
            return "float"
        if t.startswith(("DATE", "TIMESTAMP")):
            return "datetime"
        if t == "JSON":
            return "VARCHAR"  # DuckDB json_* results stringify identically
        return t
    if schema_ok:
        sty = dict(zip(scols, stypes))
        oty = dict(zip(ocols, otypes))
        mism = [c for c in scols if tclass(sty[c]) != tclass(oty[c])]
        if mism:
            schema_ok = False
            print(f"{name}: TYPE MISMATCH " + ", ".join(
                f"{c}: {sty[c]} vs {oty[c]}" for c in mism))
    hash_ok = schema_ok
    slines = olines = None
    if schema_ok:
        slines, olines = canon_lines(scols, srows), canon_lines(ocols, orows)
        hash_ok = canon(slines) == canon(olines)
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
          f"schema={schema_ok} hash={hash_ok}")
    if not schema_ok:
        print(f"  spark cols: {sorted(scols)}")
        print(f"  oracle cols: {sorted(ocols)}")
    elif not hash_ok:
        s_only, o_only = diff_preview(slines, olines)
        print(f"  cols (sorted): {sorted(scols)}")
        for l in s_only:
            print(f"  spark-only:  {l}")
        for l in o_only:
            print(f"  oracle-only: {l}")
print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
