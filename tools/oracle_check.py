#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: run after
`runMain graft.Verify <sfDir> <outDir>`; compares each dumped parquet
against the oracle SQL executed in DuckDB over the sf tables."""
import duckdb, sys, json, os, math

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['lineitem','orders','customer','nation','region','supplier','part',
          'events','documents','embeddings']:
    p = f'{sfdir}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'NaN'
        return v
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

fails, okc, skip = [], 0, 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    d = f'{outdir}/{name}'
    if not os.path.isdir(d):
        fails.append((name, 'no spark dump')); continue
    try:
        cur = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        gcols = [c[0] for c in cur.description]
        got = [tuple(norm(v) for v in r) for r in cur.fetchall()]
        wcur = con.execute(sql)
        wcols = [c[0] for c in wcur.description]
        wrows = wcur.fetchall()
        # driver compare aligns columns by NAME and hashes sorted rows
        # (verified: r5-passing queries differ in column/row order)
        if set(gcols) == set(wcols) and gcols != wcols:
            idx = [wcols.index(c) for c in gcols]
            wrows = [tuple(r[i] for i in idx) for r in wrows]
        elif set(gcols) != set(wcols):
            fails.append((name, f'SCHEMA diff: {gcols} vs {wcols}')); continue
        want = [tuple(norm(v) for v in r) for r in wrows]
    except Exception as e:
        fails.append((name, f'error: {e}')); continue
    if got == want: okc += 1
    elif sorted(map(repr,got)) == sorted(map(repr,want)):
        okc += 1  # multiset-equal: driver hashes sorted rows
    else:
        diff = [i for i,(a,b) in enumerate(zip(got,want)) if a!=b][:3]
        fails.append((name, f'MISMATCH rows {len(got)} vs {len(want)}; first diffs at {diff}; '
                      f'got={got[diff[0]] if diff else None} want={want[diff[0]] if diff else None}'))
print(f"ok={okc} fail={len(fails)}")
for n, m in fails: print(f"FAIL {n}: {m}")
sys.exit(1 if fails else 0)
