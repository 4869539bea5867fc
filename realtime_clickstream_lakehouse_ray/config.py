"""Engine-wide Ray Data context tuning (no ray.init here — sessions are
owned by the driver / tests / bench)."""

from __future__ import annotations


def cap_worker_thread_pools():
    """Call BEFORE ``ray.init`` (workers inherit the session's env).

    Ray's sort-reduce re-sorts each reduce partition with polars, whose
    thread pool defaults to ALL logical cores *per task* — with N
    concurrent 1-CPU reduce tasks that is N full-size pools thrashing one
    box (measured: capping to 2 cut the z-order SortReduce stage's total
    remote time by a third).  ``setdefault`` so an explicit user setting
    wins.  Only the session owners (bench, tests, CLI) call this — the
    library never touches the environment of a session it doesn't own."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "2")


def tune_context():
    """Idempotent DataContext tuning for the engine's workloads:

    - ``SORT_SHUFFLE_PUSH_BASED``: the pull-based sort's reduce phase runs
      nearly serially on this workload (measured ~2.6x effective
      parallelism at 16 CPUs — flat wall time from 4 to 32 CPUs); the
      push-based shuffle pipelines merge work across reducers and restores
      CPU scaling (2.25 GB z-order sort: 36.2s at 4 CPUs -> 10.5s at 16,
      0.86 efficiency);
    - ``use_polars_sort``: the Rust per-block sort path beat the pyarrow
      one by ~10x under the pull-based shuffle and stays neutral-to-
      positive under push;
    - progress bars off (bench/test noise).
    """
    import ray.data

    ctx = ray.data.DataContext.get_current()
    try:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except (ImportError, AttributeError):  # older ray without the knob
        pass
    try:
        ctx.use_polars_sort = True
    except AttributeError:
        pass
    # Reads pad parallelism to >= read_op_min_num_blocks (Ray default 200)
    # regardless of cluster size.  For the shuffle paths that is pure
    # overhead: a range sort moves num_map_blocks x num_reduce_partitions
    # objects, so 345 ~6 MB blocks cost ~60k tiny transfers where 64
    # larger blocks cost a quarter of that (measured: the 2.25 GB z-order
    # sort drops ~31% wall).  2x available CPUs keeps every core busy at
    # any cluster size (Ray's own 2-4x guidance) while letting blocks grow
    # toward target_max_block_size.
    try:
        import ray

        ncpu = (
            int(ray.available_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        ctx.read_op_min_num_blocks = max(16, 2 * ncpu)
    except Exception:
        pass
    ctx.enable_progress_bars = False
    _filter_empty_partition_schema_warning()
    return ctx


class _EmptyPartitionSchemaWarning(__import__("logging").Filter):
    """Suppress the executor's 'RefBundle with a different schema' warning.

    Root cause (verified by minimal repro, round 5): a sort-based
    ``groupby`` whose reduce partition count exceeds the number of
    distinct keys produces EMPTY reduce partitions, and Ray emits those
    as zero-COLUMN blocks; ``map_batches``/``map_groups`` never invoke
    the UDF on an empty block, so no user-level transform can conform
    them to the stage schema — the mixed (typed, schema-less-empty)
    bundles are generated entirely inside Ray.  Every consumer in this
    engine is empty-block-defensive (``b.num_rows and col in
    b.column_names`` guards), so the condition the warning flags is
    benign here; this targeted filter drops exactly that message and
    nothing else."""

    def filter(self, record) -> bool:  # noqa: A003 - logging API name
        return "RefBundle with a different schema" not in record.getMessage()


def _filter_empty_partition_schema_warning() -> None:
    import logging

    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(
        isinstance(f, _EmptyPartitionSchemaWarning) for f in logger.filters
    ):
        logger.addFilter(_EmptyPartitionSchemaWarning())
