"""Process-wide Ray Data execution tuning (DataContext only — never
ray.init; the session is owned by the caller/driver).

Why hash shuffle: Ray 2.49's default sort-based shuffle executes its map
phase with very low task parallelism on small/medium datasets, serializing
every groupby in the pipeline (measured: 5 groupbys -> scaling efficiency
0.36 at 8-vs-32 CPUs).  The hash-shuffle strategy streams partials into a
bounded pool of aggregator actors and scales with CPUs (measured efficiency
0.80+ on the same workload).  The aggregator count must be capped — the
default (~200 actors) fork-bombs a 32-CPU single node.
"""

from __future__ import annotations

import os

_configured = False


def configure(num_cpus: int | None = None, force: bool = False) -> None:
    """Idempotent DataContext tuning. Respects RAYKG_NO_CTX_TUNE=1."""
    global _configured
    if _configured and not force:
        return
    _configured = True

    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if os.environ.get("RAYKG_NO_CTX_TUNE"):
        return

    if num_cpus is None:
        try:
            import ray

            if ray.is_initialized():
                num_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            pass
    n = num_cpus or 8

    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Partition count drives map-side fan-out: every input block submits one
    # shard per partition and BLOCKS until the aggregator accepts it
    # (hash_shuffle.py _shuffle_block), so more partitions = more actor
    # round-trips per block. max(16, n) keeps reduce parallelism scaling
    # with CPUs; RAYKG_SHUFFLE_PARALLELISM overrides for tuning.
    par_env = os.environ.get("RAYKG_SHUFFLE_PARALLELISM")
    ctx.default_hash_shuffle_parallelism = int(par_env) if par_env else max(16, n)
    # Reduce-side parallelism must GROW with the cluster or shuffles become
    # the serial section (measured: max(2, n//4) pinned both the 2- and
    # 8-CPU scaling legs at 2 aggregators -> E = 0.57).  n//2 keeps the
    # aggregator pool proportional while staying far under the ~200-actor
    # default that fork-bombs a single node.
    agg_env = os.environ.get("RAYKG_MAX_AGGREGATORS")
    ctx.max_hash_shuffle_aggregators = (
        int(agg_env) if agg_env else max(1, n // 2)
    )
    _patch_hash_shuffle_schema_broadcast()
    _patch_aggregator_sort_tolerance()
    _patch_empty_schema_symmetry()


class _SortTolerantAggFactory:
    """Wraps the hash-shuffle aggregation factory so ``Concat.finalize``
    tolerates partitions that never received a schema-carrying shard.

    Why this can happen (Ray 2.49): map operators SKIP the user fn on
    0-row blocks, and ``_shuffle_block`` early-returns on 0-row blocks
    BEFORE the ``send_empty_blocks`` schema fan-out.  So when a grouped
    shuffle's ENTIRE input is empty (a legitimate state: e.g. a candidate
    generator that found nothing feeding a grouped reduce), no aggregator
    ever sees a schema, ``finalize`` builds a zero-column table, and
    ``sort_by('<bucket>')`` dies with ArrowInvalid.  The tolerant finalize
    skips the sort when the sort keys are absent — only possible for
    all-empty partitions, where sorting is a no-op anyway.

    This class lives at module level in an importable package so
    cloudpickle ships it by reference and the aggregator ACTOR (which
    never runs ``configure()``) resolves it at unpickle time."""

    def __init__(self, orig):
        self._orig = orig

    def __call__(self, aggregator_id, target_partition_ids):
        agg = self._orig(aggregator_id, target_partition_ids)
        _make_sort_tolerant(agg)
        return agg


def _make_sort_tolerant(agg) -> None:
    """Instance-level finalize override for Concat aggregations (runs on
    the aggregator actor; see _SortTolerantAggFactory)."""
    try:
        from ray.data._internal.execution.operators.hash_shuffle import Concat
    except Exception:  # noqa: BLE001
        return
    if not isinstance(agg, Concat) or not getattr(agg, "_should_sort", False):
        return

    def finalize(partition_id):
        block = agg._partition_block_builders[partition_id].build()
        keys = tuple(agg._key_columns or ())
        if keys and all(k in block.schema.names for k in keys):
            block = block.sort_by([(k, "ascending") for k in keys])
        return block

    agg.finalize = finalize


def _patch_aggregator_sort_tolerance() -> None:
    """Driver-side hook: AggregatorPool.__init__ wraps the aggregation
    factory in _SortTolerantAggFactory before it is ray.put for the
    aggregator actors."""
    import inspect

    try:
        from ray.data._internal.execution.operators.hash_shuffle import (
            AggregatorPool,
        )
    except Exception:  # noqa: BLE001 — future Ray versions: patch not needed
        return
    if getattr(AggregatorPool, "_raykg_sort_tolerant", False):
        return

    orig_init = AggregatorPool.__init__

    def patched(self, *args, **kwargs):
        try:
            bound = inspect.signature(orig_init).bind(self, *args, **kwargs)
            if "aggregation_factory" in bound.arguments:
                bound.arguments["aggregation_factory"] = _SortTolerantAggFactory(
                    bound.arguments["aggregation_factory"]
                )
            return orig_init(*bound.args, **bound.kwargs)
        except TypeError:
            return orig_init(self, *args, **kwargs)

    AggregatorPool.__init__ = patched
    AggregatorPool._raykg_sort_tolerant = True


def _patch_hash_shuffle_schema_broadcast() -> None:
    """Work around a Ray 2.49 hash-shuffle race (driver-side, so a plain
    monkey-patch reaches it): `HashShufflingOperatorBase` broadcasts block
    schemas to its aggregator pool only alongside the FIRST shuffle task of
    each input sequence — but if that first block has zero rows, the worker
    task early-returns without sending anything while the driver still
    marks schemas as broadcasted.  Any aggregator partition that then
    receives no real shard finalizes a zero-column table and dies in
    `sort_by('<key>')` (ArrowInvalid: no match for FieldRef).  Zero-row
    blocks are routine here: every groupby hash-partition / fixed-count
    repartition emits them when data is small relative to partition count.

    Fix: per input bundle, submit non-empty blocks first so the schema
    broadcast rides a block that has a schema; if a bundle is entirely
    empty and schemas haven't been broadcast yet, suppress the flag for the
    duration so a later non-empty bundle still broadcasts."""
    try:
        from ray.data._internal.execution.interfaces.ref_bundle import RefBundle
        from ray.data._internal.execution.operators.hash_shuffle import (
            HashShufflingOperatorBase,
        )
    except Exception:  # noqa: BLE001 — future Ray versions: patch not needed
        return
    if getattr(HashShufflingOperatorBase, "_raykg_schema_patch", False):
        return

    orig = HashShufflingOperatorBase._do_add_input_inner

    def patched(self, input_bundle, input_index):
        try:
            blocks = input_bundle.blocks
            empty = tuple(b for b in blocks if not (b[1].num_rows or 0))
            if not empty or self._has_schemas_broadcasted[input_index]:
                return orig(self, input_bundle, input_index)
            nonempty = tuple(b for b in blocks if (b[1].num_rows or 0))
            if nonempty:
                reordered = RefBundle(
                    blocks=nonempty + empty,
                    schema=input_bundle.schema,
                    owns_blocks=input_bundle.owns_blocks,
                    output_split_idx=input_bundle.output_split_idx,
                )
                return orig(self, reordered, input_index)
            # all-empty bundle before any broadcast: don't consume the
            # one-shot broadcast on blocks that can't carry a schema
            self._has_schemas_broadcasted[input_index] = True
            try:
                return orig(self, input_bundle, input_index)
            finally:
                self._has_schemas_broadcasted[input_index] = False
        except AttributeError:
            return orig(self, input_bundle, input_index)

    HashShufflingOperatorBase._do_add_input_inner = patched
    HashShufflingOperatorBase._raykg_schema_patch = True


def pin_dataset(ds, name: str):
    """Pin a multi-consumer intermediate.

    Default: ``ds.materialize()`` — blocks live in the object store (fast,
    spills under plasma pressure but still owns store quota).  With
    ``RAYKG_SPILL_DIR`` set, the intermediate is instead checkpointed to
    partitioned parquet and re-read lazily: the 100-TB path, where pinned
    full-graph tables must not hold object-store memory across the
    downstream shuffles.  Atomic (tmp+rename), overwrites any stale
    checkpoint of the same name; both paths return a Dataset with identical
    rows (parity pinned in tests/test_merge.py).
    """
    root = os.environ.get("RAYKG_SPILL_DIR")
    if not root:
        return ds.materialize()
    import shutil

    import ray.data

    path = os.path.join(root, name)
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return ray.data.read_parquet(path)


def _patch_empty_schema_symmetry() -> None:
    """Ray's executor skips the schema-divergence warning when the OLD
    schema is empty but warns when the NEW bundle's schema is empty
    (streaming_executor_state.dedupe_schemas_with_validation) — yet a
    zero-column empty block, which a hash-shuffle aggregator finalizes for
    any partition that received no shards, carries no schema information
    at all.  Treat the two directions symmetrically: keep the old schema
    and stay quiet.  This removes the cosmetic "new schema: ." warning
    tail without masking REAL schema divergences (non-empty vs non-empty
    still warns)."""
    try:
        from ray.data._internal.execution import (
            streaming_executor_state as _ses,
        )
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle,
        )
        from ray.data.block import _is_empty_schema
    except Exception:  # noqa: BLE001 — future Ray versions: patch not needed
        return
    if getattr(_ses, "_raykg_empty_schema_patch", False):
        return
    orig = _ses.dedupe_schemas_with_validation

    def patched(old_schema, bundle, warn=True, enforce_schemas=False):
        if (
            not _is_empty_schema(old_schema)
            and _is_empty_schema(bundle.schema)
        ):
            try:
                # private ctor kwargs match the pinned Ray build; if a
                # future Ray changes the signature, degrade to the original
                # (cosmetic warning) instead of crashing the executor
                return (
                    RefBundle(
                        bundle.blocks,
                        schema=old_schema,
                        owns_blocks=bundle.owns_blocks,
                        output_split_idx=bundle.output_split_idx,
                        _cached_object_meta=bundle._cached_object_meta,
                        _cached_preferred_locations=bundle._cached_preferred_locations,
                    ),
                    False,
                )
            except Exception:  # noqa: BLE001
                pass
        return orig(old_schema, bundle, warn=warn,
                    enforce_schemas=enforce_schemas)

    _ses.dedupe_schemas_with_validation = patched
    _ses._raykg_empty_schema_patch = True
