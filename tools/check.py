#!/usr/bin/env python3
"""Local oracle-compare harness (mimics the driver's t2 check).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

For each <name> subdir in verify_out_dir, runs oracle_sql.json[name] in
DuckDB against the sf_dir parquet tables and compares with the Spark
parquet dump: columns sorted by name, rows sorted, values normalized
(floats rounded to 9 sig figs but NEVER collapsed to int — the driver's
hash distinguishes int64 69 from float64 69.0, so we must too; round 5's
a30 HUGEINT->float64 drift escaped because this file normalized it away).
Column dtype KINDS (int vs float vs other) are also compared directly.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # Keep the int/float distinction (int64 69 vs float64 69.0 — the
        # drift the driver hash sees) WITHOUT splitting float-vs-float
        # near-ties: every float renders through the same 9-sig-fig
        # format with an "f" marker, so 69.0 and 68.99999999999999 both
        # canonicalize to "f69" (equal), while int 69 stays "69".
        return f"f{v:.9g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def dtype_kind(dt):
    # Collapse pandas dtypes to the classes the driver's hash can tell
    # apart: signed/unsigned ints are interchangeable, int vs float is not.
    k = dt.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "obj")


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    kinds = [dtype_kind(df[c].dtype) for c in df.columns]
    return list(df.columns), kinds, rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c
    con = connect()
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d)) and not d.startswith(".")]
    failed = []
    import time
    for name in names:
        t0 = time.time()
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracles:
            print(f"{name:24s} ROWS-ONLY rows={len(spark_df)}", flush=True)
            continue
        # per-key oracle timeout: an enumeration-style oracle on a
        # pathological corpus (e.g. c132 on long uniform tokens) must
        # fail LOUDLY here, not hang the whole differential loop. The
        # timer wraps ONLY the oracle execute (t_oracle, not the Spark
        # dump read), and any key where it fired — even spuriously in
        # the cancel race after a near-budget finish — gets a FRESH
        # connection so a stale interrupt flag can never poison the
        # next key's execute.
        import threading
        budget = float(os.environ.get("CHECK_ORACLE_TIMEOUT_SEC", "180"))
        fired = threading.Event()
        def interrupt():
            fired.set()
            con.interrupt()
        timer = threading.Timer(budget, interrupt)
        t_oracle = time.time()
        timer.start()
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            kind = "ORACLE-TIMEOUT" if fired.is_set() else "ORACLE-ERROR"
            print(f"{name:24s} {kind} {str(e)[:120]} "
                  f"({time.time() - t_oracle:.0f}s)", flush=True)
            failed.append(name)
            con = connect()
            continue
        finally:
            timer.cancel()
            # cancel() does not stop an in-flight callback: join the
            # timer thread so a near-budget firing cannot set `fired` /
            # interrupt the connection AFTER this check and poison the
            # NEXT key's execute as a misattributed ORACLE-ERROR
            timer.join()
            if fired.is_set():
                con = connect()
        scols, skinds, srows = canon(spark_df)
        ocols, okinds, orows = canon(odf)
        if scols != ocols:
            print(f"{name:24s} SCHEMA-MISMATCH spark={scols} oracle={ocols}")
            failed.append(name)
        elif skinds != okinds:
            diffs = [f"{c}: spark={a} oracle={b}"
                     for c, a, b in zip(scols, skinds, okinds) if a != b]
            print(f"{name:24s} DTYPE-MISMATCH {'; '.join(diffs)}")
            failed.append(name)
        elif srows != orows:
            print(f"{name:24s} HASH-MISMATCH rows spark={len(srows)} oracle={len(orows)}")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark : {a}\n      oracle: {b}")
                    break
            if len(srows) != len(orows):
                only_s = [r for r in srows if r not in set(map(tuple, orows))][:2]
                only_o = [r for r in orows if r not in set(map(tuple, srows))][:2]
                print(f"    spark-only: {only_s}\n    oracle-only: {only_o}")
            failed.append(name)
        else:
            print(f"{name:24s} OK rows={len(srows)} ({time.time()-t0:.1f}s)",
                  flush=True)
    print(f"\n{len(names)-len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
