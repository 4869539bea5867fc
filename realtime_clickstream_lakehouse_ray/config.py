"""Engine-wide Ray Data context tuning (no ray.init here — sessions are
owned by the driver / tests / bench)."""

from __future__ import annotations


def tune_context():
    """Idempotent DataContext tuning for the engine's workloads:

    - ``use_polars_sort``: the Rust sort path is ~10x faster than the
      default per-block pyarrow sort for our wide token rows (measured:
      42s -> 4s for a 220 MB z-order shuffle at 8 CPUs);
    - progress bars off (bench/test noise).
    """
    import ray.data

    ctx = ray.data.DataContext.get_current()
    try:
        ctx.use_polars_sort = True
    except AttributeError:  # older/newer ray without the knob
        pass
    ctx.enable_progress_bars = False
    return ctx
