"""Column profiler — the data-quality summary every ingest pipeline runs
first: per column row count, null count, EXACT distinct count, min and max.

Scale shape: counts/min/max come from per-batch combiners (constant rows
per batch); the exact distinct count is the one shuffle — a flat-map to
``(col, value)`` keys reduced by the standard bucketed groupby, so the
shuffle moves one row per distinct (col, value) per batch, never payloads.
At 100 TB swap the exact-distinct leg for the HLL sketch
(``stages/sketch.hll_registers``) — the rest of the profile is
shuffle-free either way.  min/max stringify through repr-stable paths
(ints and ASCII-ish strings), so the profile is value-exact in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupagg import bucketed_groupby_agg


def profile_table(ds, cols: list[str]):
    """-> Dataset(col, n, n_null, n_distinct, min_val, max_val) — one row
    per profiled column; min/max as strings (numeric columns compare
    numerically first, then stringify)."""

    def mm_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = batch[c]
            nn = s.dropna()
            rows.append(
                (c, len(s), int(s.isna().sum()),
                 None if nn.empty else nn.min(),
                 None if nn.empty else nn.max())
            )
        return pd.DataFrame(rows, columns=["col", "n", "n_null", "mn", "mx"])

    parts = ds.map_batches(mm_partial, batch_format="pandas").to_pandas()

    def kv_rows(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame({"col": c, "val": batch[c].dropna().astype(str).unique()})
            for c in cols
        ]
        out = pd.concat(frames, ignore_index=True)
        if not len(out):
            return pd.DataFrame({"col": pd.Series(dtype=object),
                                 "val": pd.Series(dtype=object)})
        from ..arrowutil import strip_pd_metadata

        return strip_pd_metadata(out)

    per_value = bucketed_groupby_agg(
        ds.map_batches(kv_rows, batch_format="pandas"),
        keys=["col", "val"],
        aggs={"c": (None, "count")},
    )
    ndist = bucketed_groupby_agg(
        per_value.map_batches(lambda b: b[["col"]], batch_format="pandas"),
        keys=["col"],
        aggs={"n_distinct": (None, "count")},
    ).to_pandas().set_index("col")["n_distinct"]

    def col_rows(c: str):
        sub = parts[parts["col"] == c]
        mn = sub["mn"].dropna()
        mx = sub["mx"].dropna()
        return (
            int(sub["n"].sum()), int(sub["n_null"].sum()),
            _s(mn.min()) if len(mn) else None,
            _s(mx.max()) if len(mx) else None,
        )

    stats = [col_rows(c) for c in cols]
    out = pd.DataFrame(
        {
            "col": pd.Series(cols, dtype=object),
            "n": pd.Series([s[0] for s in stats], dtype="int64"),
            "n_null": pd.Series([s[1] for s in stats], dtype="int64"),
            "n_distinct": pd.Series(
                [int(ndist.get(c, 0)) for c in cols], dtype="int64"
            ),
            "min_val": pd.Series([s[2] for s in stats], dtype=object),
            "max_val": pd.Series([s[3] for s in stats], dtype=object),
        }
    )
    import ray.data

    return ray.data.from_pandas(out)


def _s(v) -> str | None:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def column_histogram(ds, col: str, lo: float, hi: float, n_bins: int = 20):
    """Equi-width histogram over a numeric column — the profiling
    counterpart of global_quantiles (there: exact order statistics; here:
    the distribution shape scan query optimizers and drift monitors run).

    Bin i covers [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/n_bins; values
    below lo clamp into bin 0, values >= hi into bin n_bins-1 (so the
    histogram is total).  NULLs are dropped and reported via
    profile_table.  -> Dataset(bin, lo_edge, hi_edge, n), n_bins rows,
    EVERY bin present (zero-count bins included) so downstream plotting /
    drift-compare never special-cases gaps.

    Scale shape: one streaming pass; the per-batch combiner emits at most
    n_bins rows, the final reduce is one tiny bucketed sum — same
    discipline as grouped_corr_components."""
    import numpy as np
    import ray.data

    w = (hi - lo) / n_bins

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].dropna().to_numpy(dtype="float64")
        idx = np.clip(((v - lo) / w).astype("int64"), 0, n_bins - 1)
        counts = np.bincount(idx, minlength=n_bins).astype("int64")
        return pd.DataFrame(
            {"bin": np.arange(n_bins, dtype="int64"), "n": counts}
        )

    sums = bucketed_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["bin"],
        aggs={"n": ("n", "sum")},
    )

    def edges(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["lo_edge"] = lo + out["bin"] * w
        out["hi_edge"] = lo + (out["bin"] + 1) * w
        return out[["bin", "lo_edge", "hi_edge", "n"]]

    # bins absent from every batch (all-zero) still appear because the
    # partial emits ALL n_bins rows per batch
    return sums.map_batches(edges, batch_format="pandas")


# --------------------------------------------------- expectations

def expect(name: str, col: str, kind: str, **params) -> dict:
    """One declarative data-quality rule; see `run_expectations`."""
    return {"name": name, "col": col, "kind": kind, "params": params}


def run_expectations(ds, rules: list[dict]):
    """Great-Expectations-style validation gate in ONE streaming pass:
    every rule is evaluated vectorized on every batch, each batch emits
    one (rule, n_checked, n_violations) partial row per rule, and the
    driver folds rules x n_batches tiny rows — constant state at any
    input size, no shuffle.  The 100-TB ingest contract check: a corrupt
    shard shows up as a violation count, not a crashed pipeline.

    Rule kinds (all integer-exact, SQL-mirrorable):
      not_null                 — value is null
      between(lo, hi)          — value outside [lo, hi] (nulls violate)
      in_set(values)           — value not in the allowed set (nulls violate)
      regex_match(pattern)     — full-match failure on str(value) (nulls violate)

    Output: Dataset(rule, n_checked, n_violations) — one row per rule.

    No reference counterpart (the reference validates records only inside
    the extraction parser, text2graph.py:34-71); this is an engine-level
    extension.
    """
    import re

    compiled = {
        r["name"]: re.compile(r["params"]["pattern"])
        for r in rules
        if r["kind"] == "regex_match"
    }

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        names, checked, viol = [], [], []
        for r in rules:
            s = batch[r["col"]]
            null = s.isna()
            if r["kind"] == "not_null":
                bad = int(null.sum())
            elif r["kind"] == "between":
                lo, hi = r["params"]["lo"], r["params"]["hi"]
                ok = (~null) & (s >= lo) & (s <= hi)
                bad = int(len(s) - ok.sum())
            elif r["kind"] == "in_set":
                ok = (~null) & s.isin(list(r["params"]["values"]))
                bad = int(len(s) - ok.sum())
            elif r["kind"] == "regex_match":
                pat = compiled[r["name"]]
                ok = (~null) & s.astype(str).map(
                    lambda x: pat.fullmatch(x) is not None
                )
                bad = int(len(s) - ok.sum())
            else:
                raise ValueError(f"unknown expectation kind {r['kind']!r}")
            names.append(r["name"])
            checked.append(len(s))
            viol.append(bad)
        return pd.DataFrame(
            {"rule": pd.Series(names, dtype=object),
             "n_checked": np.asarray(checked, dtype=np.int64),
             "n_violations": np.asarray(viol, dtype=np.int64)}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("rule", as_index=False)[["n_checked", "n_violations"]]
        .sum()
        .astype({"n_checked": "int64", "n_violations": "int64"})
        .sort_values("rule")
        .reset_index(drop=True)
    )
    import ray.data

    return ray.data.from_pandas(out)


def fk_orphan_audit(relations):
    """Referential-integrity audit — the cross-table data-quality gate a
    warehouse runs before training-data joins: for each (name, fact_ds,
    fk_col, dim_ds, pk_col) relation, count fact rows / distinct FK values
    and how many of each dangle (no matching dimension key).  NULL-FK rows
    are excluded here (the not_null rule of run_expectations owns those).

    -> Dataset(relation, n_rows, n_distinct_fk, n_orphan_keys,
    n_orphan_rows), one row per relation.

    Scale shape: the fact side reduces to per-batch (fk, count) partials
    before any shuffle (combiner discipline — per-occurrence rows never
    move); dimension keys reduce the same way; ONE key-bucketed left join
    per relation marks orphans; the relation row folds via a constant-key
    combiner reduce.  Driver state: none."""
    import ray.data

    from .join import bucketed_join

    outs = []
    for name, fact_ds, fk_col, dim_ds, pk_col in relations:

        def fk_partial(b: pd.DataFrame, _c: str = fk_col) -> pd.DataFrame:
            s = b[_c].dropna()
            vc = s.value_counts()
            return pd.DataFrame(
                {"k": vc.index.to_numpy(dtype=np.int64),
                 "n": vc.to_numpy(dtype=np.int64)}
            )

        fk_counts = bucketed_groupby_agg(
            fact_ds.map_batches(fk_partial, batch_format="pandas"),
            keys=["k"],
            aggs={"n": ("n", "sum")},
        )

        def pk_partial(b: pd.DataFrame, _c: str = pk_col) -> pd.DataFrame:
            u = b[_c].dropna().unique()
            return pd.DataFrame(
                {"k": np.asarray(u, dtype=np.int64),
                 "one": np.ones(len(u), dtype=np.int64)}
            )

        dim_keys = bucketed_groupby_agg(
            dim_ds.map_batches(pk_partial, batch_format="pandas"),
            keys=["k"],
            aggs={"one": ("one", "min")},
        )

        marked = bucketed_join(fk_counts, dim_keys, on="k", how="left")

        def fold_partial(b: pd.DataFrame, _name: str = name) -> pd.DataFrame:
            orphan = b["one"].isna()
            return pd.DataFrame(
                {"relation": pd.array([_name], dtype="string"),
                 "n_rows": [int(b["n"].sum())],
                 "n_distinct_fk": [len(b)],
                 "n_orphan_keys": [int(orphan.sum())],
                 "n_orphan_rows": [int(b.loc[orphan, "n"].sum())]}
            )

        folded = bucketed_groupby_agg(
            marked.map_batches(fold_partial, batch_format="pandas"),
            keys=["relation"],
            aggs={"n_rows": ("n_rows", "sum"),
                  "n_distinct_fk": ("n_distinct_fk", "sum"),
                  "n_orphan_keys": ("n_orphan_keys", "sum"),
                  "n_orphan_rows": ("n_orphan_rows", "sum")},
        )
        # one row per relation: pin it so the union of R relations doesn't
        # stack R x 4 hash-shuffle operators into ONE plan (the >2-shuffle
        # aggregator-pool deadlock this Ray build hits; see merge_graph)
        outs.append(folded.materialize())

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.map_batches(
        lambda b: b[["relation", "n_rows", "n_distinct_fk",
                     "n_orphan_keys", "n_orphan_rows"]].astype(
            {"relation": object}
        ),
        batch_format="pandas",
    )


def grouped_dominance(
    ds,
    keys: list[str],
    cat_col: str,
    n_buckets: int = 64,
):
    """Per-group categorical composition profile: total rows, distinct
    categories, the DOMINANT category (max count, ties -> lexicographic
    min) and its parts-per-million share — the "is this repo really
    Python" / "is this source really English" monitor a corpus-mixture
    dashboard runs per partition.

    -> Dataset(keys..., n_rows, n_cats, top_cat, top_ppm), integers exact.

    Shape: ONE combiner-backed grouped count over (keys, cat) — per-batch
    partial counts shuffle, never rows — then the per-key argmax/rollup is
    a vectorized pass inside the SAME key-bucketed reduce (the (keys, cat)
    bucket is keyed on `keys` alone, so a key's whole composition lands in
    one task; categories-per-key is vocabulary-bounded)."""
    from .groupagg import bucketed_groupby_agg, key_bucket

    counts = bucketed_groupby_agg(
        ds, keys=keys + [cat_col], aggs={"n": (None, "count")},
        n_buckets=n_buckets,
    )

    def add_kbucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = batch.assign(_kbucket=key_bucket(batch, keys, n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 "n_rows": pd.Series(dtype="int64"),
                 "n_cats": pd.Series(dtype="int64"),
                 "top_cat": pd.Series(dtype=object),
                 "top_ppm": pd.Series(dtype="int64")}
            )
        b = bucket.sort_values(keys + ["n", cat_col], kind="mergesort",
                               ascending=[True] * len(keys) + [False, True])
        g = b.groupby(keys, sort=False)
        # g.head(1) after the (n desc, cat asc) sort IS the dominance row
        head = g.head(1)
        agg = g.agg(n_rows=("n", "sum"), n_cats=("n", "size")).reset_index()
        out = agg.merge(
            head[keys + [cat_col, "n"]].rename(
                columns={cat_col: "top_cat", "n": "_topn"}),
            on=keys,
        )
        out["top_ppm"] = (out["_topn"] * 1_000_000 // out["n_rows"]).astype(
            "int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["n_cats"] = out["n_cats"].astype("int64")
        return out.drop(columns=["_topn"])

    return (
        counts.map_batches(add_kbucket, batch_format="pandas")
        .groupby("_kbucket")
        .map_groups(finish, batch_format="pandas")
        .repartition(8)
    )
