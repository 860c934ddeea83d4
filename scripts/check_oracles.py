"""Side-by-side check of queries() vs oracle_sql() — mimics the driver's
correctness gate (row count + schema + order-insensitive values).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]

Set RAYKG_ORACLES_JSON=<path> to also write a per-query JSON tally
(status + row count), e.g. the committed ORACLES_FULL.json artifact.
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # scale-dependent oracle literals (IVF centroids) follow the target sf
    os.environ["RAYKG_ORACLE_SF"] = sf_dir
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    tally = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            ours = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
            if name not in oracles:
                print(f"{name:24s} rows-only: {len(ours)} rows  (no oracle)")
                tally[name] = {"status": "rows_only", "rows": int(len(ours))}
                continue
            sql = oracles[name]
            # oracle strings are written against sf0.01; for other sfs swap
            # the corpus path so local runs still line up
            if "/tmp/raykg_corpus/" in sql and sf_dir not in ("/root/testdata/sf0.01",):
                from mmgraphrag_ray.corpus import ensure_corpus

                sql = sql.replace(
                    ensure_corpus("/root/testdata/sf0.01"), ensure_corpus(sf_dir)
                )
            theirs = con.sql(sql).df()
            a, b = normalize(ours), normalize(theirs)
            status = []
            if len(a) != len(b):
                status.append(f"ROWS {len(a)} vs {len(b)}")
            if list(a.columns) != list(b.columns):
                status.append(f"COLS {list(a.columns)} vs {list(b.columns)}")
            if not status:
                if not a.equals(b):
                    neq = (a != b) & ~(a.isna() & b.isna())
                    bad_cols = [c for c in a.columns if neq[c].any()]
                    status.append(f"VALUES differ in {bad_cols[:4]} ({int(neq.sum().sum())} cells)")
            if status:
                failures.append(name)
                print(f"{name:24s} FAIL  {'; '.join(status)}")
                tally[name] = {"status": "fail", "detail": "; ".join(status)}
            else:
                print(f"{name:24s} OK    {len(a)} rows x {len(a.columns)} cols")
                tally[name] = {"status": "ok", "rows": int(len(a))}
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:200]}")
            tally[name] = {"status": "error",
                           "detail": f"{type(e).__name__}: {str(e)[:200]}"}

    ray.shutdown()
    out_json = os.environ.get("RAYKG_ORACLES_JSON")
    if out_json:
        import json

        ok = sum(1 for v in tally.values() if v["status"] == "ok")
        rows_only = sum(1 for v in tally.values() if v["status"] == "rows_only")
        payload_note = os.environ.get("RAYKG_ORACLES_NOTE")
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(tally),
                       **({"note": payload_note} if payload_note else {}),
                       "n_ok": ok, "n_rows_only": rows_only,
                       "n_failed": len(failures), "failed": sorted(failures),
                       "queries": tally}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}: {ok} ok / {rows_only} rows-only / "
              f"{len(failures)} failed of {len(tally)}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
