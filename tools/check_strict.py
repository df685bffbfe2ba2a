#!/usr/bin/env python3
"""Strict mimic of the driver's hasher (best-effort reconstruction).

Round-1 evidence: the driver sorts results with pandas (mm_features crashed
in pandas sort_values) and flagged hash mismatches on exactly the queries
whose oracle emitted HUGEINT (uncast sums) or DECIMAL(<=18) aggregates, while
rows/schema matched. This checker reproduces that sensitivity:

  spark side : pandas.read_parquet  (pyarrow: decimals -> Decimal objects,
               int64 stays int64)
  oracle side: duckdb .df()         (HUGEINT/DECIMAL -> float64)
  compare    : sorted columns, sorted rows, STRICT per-value repr
               (no float rounding, int64 != float64)

A query passes here only if both engines emit the same primitive dtypes with
bit-identical values — the output-type discipline SparkEntry enforces
(BIGINT / DOUBLE / VARCHAR aggregate outputs on both sides).

Usage: python3 tools/check_strict.py SFDIR OUTDIR [CACHEDIR]

CACHEDIR (optional): an oracle-result cache written by
`check_oracle.py SFDIR OUTDIR CACHEDIR`. A cache hit requires ALL of
(round 17, per the r16 ADVICE — before this the key was the SQL md5 alone):

  - the manifest entry is the r17 dict form (pre-r17 string entries miss),
  - its md5 matches the current oracle SQL,
  - its sfdir matches THIS run's SFDIR (absolute) — an md5-only key let a
    CACHEDIR reused across scale factors (the documented workflow: sf0.001
    validation, then the 10x mirror) silently compare against the wrong
    dataset's oracle rows,
  - the cached parquet's round-tripped dtypes equal the recorded
    direct-`.df()` dtypes — the strict discipline pins oracle outputs to
    BIGINT / DOUBLE / VARCHAR / BOOLEAN / lists, which round-trip
    DuckDB->parquet->`.df()` dtype-identically, but that claim is now
    ENFORCED per entry instead of asserted in this docstring (an oracle
    emitting e.g. HUGEINT would otherwise make cached and uncached strict
    runs disagree silently).

Any miss falls back to executing the SQL (and says why) — the cache can
produce spurious slowness, never a wrong verdict. It exists because the
iterated-fold graph oracles cost CPU-hours at mirror scale, and running
them twice per mirror pass (once per checker) is what stalled the r15
strict tail at `gr_hits` (r15 verdict #4).
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None or v != v:  # None / NaN
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)  # strict: float64 15.0 -> '15.0', int64 15 -> '15'


def frame_hash(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append("|".join(canon(v) for v in t))
    rows.sort()
    h = hashlib.md5()
    for line in rows:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    cachedir = sys.argv[3] if len(sys.argv) > 3 else None
    manifest = {}
    if cachedir:
        mp = os.path.join(cachedir, "manifest.json")
        if os.path.exists(mp):
            with open(mp) as f:
                manifest = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(outdir, name))
        except Exception as e:
            print(f"[FAIL] {name}: spark read error: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            # rows-only: mimic the driver's sort (crashes on unhashable cells)
            try:
                got.sort_values(by=sorted(got.columns), inplace=False)
                print(f"[rows-only] {name}: rows={len(got)}")
            except Exception as e:
                print(f"[FAIL] {name}: rows-only sort crashed: {e}")
                n_fail += 1
            continue
        try:
            pq = os.path.join(cachedir, f"{name}.parquet") if cachedir else None
            sqlmd5 = hashlib.md5(oracle[name].encode()).hexdigest()
            ent = manifest.get(name)
            want = None
            if (pq and os.path.exists(pq) and isinstance(ent, dict)
                    and ent.get("md5") == sqlmd5
                    and ent.get("sfdir") == os.path.abspath(sfdir)):
                cached = con.execute(
                    f"SELECT * FROM read_parquet('{pq}')").df()
                got_dt = {c: str(t) for c, t in cached.dtypes.items()}
                if got_dt == ent.get("dtypes"):
                    want = cached
                else:
                    print(f"[cache-dtype-drift] {name}: round-trip dtypes "
                          f"differ from recorded ({got_dt} vs "
                          f"{ent.get('dtypes')}); executing oracle SQL")
            elif cachedir:
                why = ("no entry" if ent is None
                       else "pre-r17 entry" if not isinstance(ent, dict)
                       else "sql changed" if ent.get("md5") != sqlmd5
                       else "sfdir mismatch"
                       if ent.get("sfdir") != os.path.abspath(sfdir)
                       else "no parquet")
                print(f"[cache-miss] {name} ({why}): executing oracle SQL")
            if want is None:
                want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(got.columns) == sorted(want.columns)
        ok_rows = len(got) == len(want)
        ok_hash = ok_schema and ok_rows and frame_hash(got) == frame_hash(want)
        if ok_hash:
            print(f"[ok]   {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: schema_ok={ok_schema} rows {len(got)} vs "
                  f"{len(want)} hash_ok={ok_hash}")
            if ok_schema and ok_rows:
                cols = sorted(got.columns)
                gs = sorted("|".join(canon(v) for v in t)
                            for t in got[cols].itertuples(index=False, name=None))
                ws = sorted("|".join(canon(v) for v in t)
                            for t in want[cols].itertuples(index=False, name=None))
                for a, b in zip(gs, ws):
                    if a != b:
                        print(f"        got  {a}\n        want {b}")
                        break
                print(f"        dtypes got  {dict(got[cols].dtypes.astype(str))}")
                print(f"        dtypes want {dict(want[cols].dtypes.astype(str))}")
            n_fail += 1
    print(f"== {n_pass} ok, {n_fail} fail, {len(names)} outputs")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
