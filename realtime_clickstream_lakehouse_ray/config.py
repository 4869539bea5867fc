"""Engine-wide Ray Data context tuning (no ray.init here — sessions are
owned by the driver / tests / bench)."""

from __future__ import annotations


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
    ctx.enable_progress_bars = False
    return ctx
