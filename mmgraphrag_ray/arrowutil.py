"""pandas -> Arrow conversion for shuffle-feeding stages.

Ray's hash-shuffle aggregators convert pandas blocks to Arrow with
``pa.Table.from_pandas`` (pandas_block.py:384), which attaches the pandas
metadata dict to the Arrow schema.  That schema is unhashable, so every
aggregator logs ``Failed to hash the schemas (for deduplication):
unhashable type: 'dict'`` and Ray's schema-dedup fast path is defeated.

``df_to_table`` builds the Arrow table explicitly — no index, no metadata,
and a STABLE type mapping (object/str -> string, all-null object columns ->
string instead of Arrow null) so empty partials, all-None tag columns and
populated blocks all carry byte-identical schemas through the shuffle.
Stages that feed a ``groupby`` return ``df_to_table(df)`` instead of the
raw DataFrame.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _arrow_type_for(series: pd.Series, override: pa.DataType | None) -> pa.DataType:
    if override is not None:
        return override
    dt = series.dtype
    if dt == object or str(dt) in ("string", "str"):
        # object columns default to string (empty/all-None included) so
        # block schemas never disagree — EXCEPT bytes payloads, which must
        # stay binary (a string cast would corrupt media columns)
        # positional lookup: .loc[label] returns a SERIES under duplicated
        # index labels, silently failing the isinstance check (ADVICE r4)
        first = series.first_valid_index()
        if first is not None:
            v = series.iloc[series.index.get_loc(first)]
            if isinstance(v, pd.Series):  # duplicated label -> take first
                v = v.iloc[0]
            if isinstance(v, (bytes, bytearray)):
                return pa.binary()
        return pa.string()
    if str(dt).startswith("datetime64"):
        return pa.timestamp("ns")
    return pa.from_numpy_dtype(dt)


def strip_pd_metadata(df: pd.DataFrame) -> pa.Table:
    """Generic DataFrame -> pa.Table with from_pandas type inference but NO
    pandas schema metadata (for shuffle-feeding stages whose input schema is
    caller-defined, e.g. the generic dedup_exact).  Only safe when the frame
    is non-empty and has no all-null object columns — use ``df_to_table``
    with overrides for fixed-schema partials."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _series_to_array(s: pd.Series, t: pa.DataType) -> pa.Array:
    if s.dtype == object or str(s.dtype) in ("string", "str"):
        # C-level conversion; NaN/None in object columns become nulls
        return pa.Array.from_pandas(s, type=t)
    return pa.array(s.to_numpy(), type=t)


def df_to_table(df: pd.DataFrame, **type_overrides: pa.DataType) -> pa.Table:
    """DataFrame -> metadata-free pa.Table with deterministic column types.

    Keyword overrides pin a column to a specific Arrow type (e.g.
    ``description=pa.large_string()``).  Object columns (including empty and
    all-None ones) become ``string`` so block schemas never disagree.
    NOTE: a column literally named ``df`` can't be overridden through
    kwargs (it collides with the positional parameter) — such callers use
    ``_series_to_array`` directly, as ``df_to_table_aligned`` does."""
    arrays, fields = [], []
    for c in df.columns:
        t = _arrow_type_for(df[c], type_overrides.get(c))
        arrays.append(_series_to_array(df[c], t))
        fields.append(pa.field(c, t))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def dataset_arrow_types(ds) -> dict[str, pa.DataType]:
    """Column -> Arrow type for a Dataset, whether its blocks are Arrow
    (schema is pa.Schema) or pandas (PandasBlockSchema with numpy dtypes)."""
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out: dict[str, pa.DataType] = {}
    for name, dt in zip(base.names, base.types):
        if isinstance(dt, pa.DataType):
            out[name] = dt
        elif dt == object or str(dt) in ("object", "string", "str"):
            out[name] = pa.string()
        else:
            out[name] = pa.from_numpy_dtype(dt)
    return out


def df_to_table_aligned(
    df: pd.DataFrame, columns: list[str], types: dict[str, pa.DataType]
) -> pa.Table:
    """Align a frame to a full column list (missing columns -> typed nulls)
    and emit a metadata-free Arrow table — for unions of heterogeneous sides
    feeding one shuffle (e.g. bucketed_join)."""
    n = len(df)
    arrays, fields = [], []
    for c in columns:
        t = types[c]
        if c in df.columns:
            arrays.append(_series_to_array(df[c], t))
        else:
            arrays.append(pa.nulls(n, type=t))
        fields.append(pa.field(c, t))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


COMPACT_ROWS = 65536
COMPACT_MIN_BLOCKS = 16


def compact_blocks(ds, target_rows: int | None = None):
    """Consolidate a post-shuffle Dataset's many tiny blocks WITHOUT the
    column-less empty padding a bare ``repartition(n)`` produces when n
    exceeds the row count.  Those schema-less empties are skipped by
    map_batches (a UDF can never repair them) and then poison downstream
    pandas/Arrow concats inside hash shuffles — int64 columns float-promote
    and, when a whole aggregate partition is empties, columns degrade to
    Arrow ``null`` type, which ``pa.Table.join`` rejects outright.  They
    also EXPLODE block counts across iterative shuffles (each map_groups
    emits ~n_groups tiny blocks; ``target_num_rows_per_block`` only
    SPLITS, never merges).

    Returns a MATERIALIZED dataset coalesced to
    ``clamp(rows/target_rows, COMPACT_MIN_BLOCKS, rows)`` blocks — k <=
    rows guarantees every output block is populated, so no schema-less
    padding.  Materializing here doubles as the between-shuffle pin this
    Ray build needs (>2 chained hash shuffles deadlock)."""
    import os

    rows_per = target_rows or int(os.environ.get("RAYKG_COMPACT_ROWS",
                                                 str(COMPACT_ROWS)))
    m = ds.materialize()
    try:
        per_block = m._block_num_rows()
        n = sum(per_block)
        has_empty = any(r == 0 for r in per_block)
    except Exception:  # noqa: BLE001 — internal API; fall back to count()
        n = m.count()
        has_empty = True
    if n == 0:
        return m
    k = max(1, min(n, max(COMPACT_MIN_BLOCKS, n // rows_per)))
    # redistribute when over-sharded OR any block is empty: a hash
    # shuffle's empty aggregate partitions are column-less even when the
    # block count is small, and only a row-balanced repartition removes
    # them; when blocks are already few and all populated, skip the
    # extra all-to-all entirely
    if m.num_blocks() > k or has_empty:
        m = m.repartition(min(k, m.num_blocks())).materialize()
    return m


def sever_lineage(ds):
    """Materialize and REBUILD the dataset from its block object refs,
    discarding the logical plan.  ``materialize()`` alone keeps the full
    upstream plan attached; in iterative rebinding loops
    (``labels = f(labels)`` — connected components, HyperBall, PageRank,
    BPE rounds) every round's plan embeds the previous round's plan once
    per consumer branch, so driver-side plan handling grows
    EXPONENTIALLY (~3x per round measured) and a 60-hop chain that
    should take 8 x 0.5 s rounds instead stalls for minutes.
    ``from_arrow_refs(m.to_arrow_refs())`` is zero-copy for Arrow blocks
    (refs stay in the object store) and resets the plan to a flat read."""
    import ray
    import ray.data

    m = ds.materialize()  # no-op-cheap when already materialized
    return ray.data.from_arrow_refs(m.to_arrow_refs())


def drop_empty_blocks(ds):
    """Materialize and strip schema-less EMPTY blocks without moving any
    data: rebuild from the non-empty block refs (zero-copy, like
    :func:`sever_lineage`).  The cheap alternative to a trailing
    ``repartition(n)`` when block sizes are already balanced (e.g. the
    output of a hash-shuffle ``map_groups``, one block per aggregate
    partition) and the only hazard is empty partitions poisoning
    downstream unions/shuffles."""
    import ray
    import ray.data

    m = ds.materialize()
    try:
        rows = m._block_num_rows()
    except Exception:  # noqa: BLE001 — internal API; keep as materialized
        return m
    if not any(r == 0 for r in rows) or sum(rows) == 0:
        return m
    refs = [r for r, n in zip(m.to_arrow_refs(), rows) if n > 0]
    return ray.data.from_arrow_refs(refs)
