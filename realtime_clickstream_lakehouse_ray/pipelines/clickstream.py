"""Clickstream-conformance pipelines over the ``events`` table.

These re-express the reference's per-record ingest operators (SURVEY.md
§2.3, M1-M10) as vectorized Ray Data stages:

- M1 JSON body parse + reject path  (click_handler.py:139-147)
- M2 enrichment with audit columns   (click_handler.py:150-154)
- M3/M4 required-field check + partition key default "unknown"
  (click_handler.py:157-164)
- M5/M6 envelope cast + structured parse (glue_stream.py:184-195)
- M7 timestamp parse fallback chain  (glue_stream.py:213-229)
- M8 derived partition column event_date (glue_stream.py:239)
- M9 output projection + null-fill normalizer (glue_stream.py:309-334)

The ``events`` test table plays the role of the Kinesis micro-batch: its
``props`` column is the raw JSON payload, ``event_type`` the partition
key (reference: ``element``), ``ts`` the event timestamp.  Every stage is
``map_batches(batch_format="pyarrow", zero_copy_batch=True)`` with
pyarrow.compute kernels — no per-row Python in any hot path.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from realtime_clickstream_lakehouse_ray.config import tune_context


def read_events(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def normalize_events(batch: pa.Table) -> pa.Table:
    """M1+M2+M4+M7+M8+M9 fused into one vectorized conformance stage:
    parse the JSON payload (regex kernel — the payload is the flat
    ``{"k": int}`` envelope), default-fill the partition key, derive
    ``event_date``, add the deterministic audit column ``request_id``."""
    # M6: structured parse of the JSON payload column (vectorized regex)
    k_raw = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>\d+)')
    k = pc.struct_field(k_raw, "k").cast(pa.int64())
    # M4: partition key with default "unknown" (click_handler.py:164)
    etype = pc.fill_null(batch["event_type"], "unknown")
    # M8: derived partition date column (glue_stream.py:239)
    event_date = batch["ts"].cast(pa.date32())
    # M2: audit/enrichment column (deterministic stand-in for request ids)
    request_id = pc.binary_join_element_wise(
        "req-", pc.cast(batch["event_id"], pa.string()), ""
    )
    return pa.Table.from_arrays(
        [
            batch["event_id"].combine_chunks() if isinstance(batch["event_id"], pa.ChunkedArray) else batch["event_id"],
            etype,
            event_date,
            batch["value"].combine_chunks() if isinstance(batch["value"], pa.ChunkedArray) else batch["value"],
            k,
            request_id,
        ],
        names=["event_id", "event_type", "event_date", "value", "k", "request_id"],
    )


def events_normalized(sf_dir: str) -> ray.data.Dataset:
    """The full conformance pipeline output (reference's bronze table rows)."""
    return read_events(sf_dir).map_batches(
        normalize_events, batch_format="pyarrow", zero_copy_batch=True
    )


def events_partition_counts(sf_dir: str) -> ray.data.Dataset:
    """M4 partition-key routing stats: rows per partition key (the
    reference's per-shard distribution; shard key = element/event_type).

    The key is low-cardinality and hot by design (the reference defaults
    missing keys to "unknown", click_handler.py:164), so the count uses
    SALTED repartitioning (functions/skew.py): the shuffle fans out over
    (key, salt) reducers instead of concentrating each hot key on one."""
    from realtime_clickstream_lakehouse_ray.functions.skew import salted_counts

    normalized = read_events(sf_dir, columns=["event_type"]).map_batches(
        lambda t: pa.table({"event_type": pc.fill_null(t["event_type"], "unknown")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return salted_counts(normalized, "event_type")


def events_daily_summary(sf_dir: str) -> ray.data.Dataset:
    """M8 + aggregation: per (event_date, event_type) count / value sum /
    mean payload field.  Measures are carried as exact scaled int64 through
    the shuffle and divided back to double at the end so the result is
    bit-identical to the SQL oracle (see relational._e)."""
    import numpy as np

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_date": t["event_date"],
                "event_type": t["event_type"],
                "value_e2": pa.array(
                    np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(np.int64)
                ),
                "k": t["k"],
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"]).astype(np.float64)
        return pa.table(
            {
                "event_date": t["event_date"],
                "event_type": t["event_type"],
                "n": t["n"],
                "sum_value": pa.array(np.asarray(t["s_val"]).astype(np.float64) / 100.0),
                "avg_k": pa.array(np.asarray(t["s_k"]).astype(np.float64) / n),
            }
        )

    return (
        events_normalized(sf_dir)
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_date", "event_type"])
        .aggregate(
            Count(alias_name="n"),
            Sum("value_e2", alias_name="s_val"),
            Sum("k", alias_name="s_k"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def events_sessionize(sf_dir: str, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap since
    the previous event exceeds ``gap_seconds``.

    Ray Data has no event-time windowing; the engine's windowed-aggregate
    operator is a BUCKETED shuffle (``bucket = hash(user_id) % B``, same
    template as ``events_asof_join``): all users in a bucket are
    sessionized with ONE vectorized sort + diff + reduceat — B Python
    calls total, not one per user.  Partitioning assumption: all rows of
    one user land in one bucket group (guaranteed by hashing the key);
    a hot user only skews its own bucket."""
    import numpy as np

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def tag(t: pa.Table) -> pa.Table:
        bucket = (hash64(t["user_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"], "__bucket": pa.array(bucket)}
        )

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_session = np.ones(n, dtype=np.int64)
        if n > 1:
            new_user[1:] = uid[1:] != uid[:-1]
            gap_s = (ts_us[1:] - ts_us[:-1]) / 1e6
            new_session[1:] = (new_user[1:] | (gap_s > gap_seconds)).astype(np.int64)
        starts = np.nonzero(new_user)[0]
        n_events = np.diff(np.append(starts, n))
        n_sessions = np.add.reduceat(new_session, starts) if n else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": n_events.astype(np.int64),
                "n_sessions": n_sessions.astype(np.int64),
            }
        )

    return (
        read_events(sf_dir, columns=["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def events_enriched(sf_dir: str) -> ray.data.Dataset:
    """Stream-static enrichment — the canonical streaming join shape
    (every event decorated with its user's dimension attributes): events
    ⋈ customer through the regime-choosing planner join
    (``relational.auto_hash_join``), which reads the dim side's parquet
    footers and picks BROADCAST here (customer is KBs–MBs) — the event
    stream never shuffles; at a 100-TB event volume that is the only
    acceptable plan, and the planner chooses it from stats, not a flag."""
    from realtime_clickstream_lakehouse_ray.pipelines.relational import (
        _read as _read_rel,
        auto_hash_join,
    )

    ev = read_events(sf_dir, columns=["event_id", "user_id", "event_type"])
    cust = _read_rel(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = auto_hash_join(ev, cust, "user_id", "c_custkey")
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "event_type", "c_mktsegment"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def events_session_ids(sf_dir: str, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Per-EVENT session assignment — the row-level building block the
    aggregate ``events_sessionize`` summarizes: ``session_id`` = number of
    >gap boundaries among the user's PRECEDING events (0-based), i.e. the
    windowed running count streaming engines emit per record.  Same
    bucketed one-shuffle template; per bucket ONE lexsort + cumsum labels
    ALL users at once."""
    import numpy as np

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)
    gap_us = np.int64(gap_seconds) * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        bucket = (hash64(t["user_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "__bucket": pa.array(bucket),
            }
        )

    def label_bucket(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts_us, uid))  # by user, ts, event_id
        eid, uid, ts_us = eid[order], uid[order], ts_us[order]
        n = len(g)
        bound = np.zeros(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = uid[1:] != uid[:-1]
            bound[1:] = (
                ~new_user[1:] & ((ts_us[1:] - ts_us[:-1]) > gap_us)
            ).astype(np.int64)
        b_cum = np.cumsum(bound)
        starts = np.nonzero(new_user)[0]
        runs = np.diff(np.append(starts, n))
        sid = b_cum - np.repeat(b_cum[starts], runs)
        return pd.DataFrame(
            {"event_id": eid, "user_id": uid, "session_id": sid}
        )

    return (
        read_events(sf_dir, columns=["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(label_bucket, batch_format="pandas")
    )


def events_reject_path(sf_dir: str) -> ray.data.Dataset:
    """M1's reject path as data: classify each payload as valid/malformed
    against the expected JSON envelope and count per class (the reference
    returns 400 for malformed bodies, click_handler.py:139-147)."""

    def classify(t: pa.Table) -> pa.Table:
        ok = pc.match_substring_regex(t["props"], r'^\{\s*"k"\s*:\s*\d+\s*\}$')
        status = pc.if_else(pc.fill_null(ok, False), "valid", "malformed")
        return pa.table({"status": status})

    return (
        read_events(sf_dir, columns=["props"])
        .map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("status")
        .aggregate(Count(alias_name="n"))
    )


def events_asof_join(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join — a custom operator Ray Data lacks (task-list item:
    "as-of join ... as a composition of map_batches + groupby().map_groups"):
    each ``click`` event joined to the SAME user's most recent ``purchase``
    at or before its timestamp.

    Shape: ONE shuffle — both sides are pruned and tagged with
    ``bucket = hash(user_id) % B`` in a single pass over the events table,
    co-located by ``groupby(bucket)``, and matched inside each bucket with
    ``pandas.merge_asof`` (C-implemented backward search, vectorized
    across every user in the bucket).  Partitioning assumption: all rows
    of one user land in one bucket group (guaranteed by hashing the join
    key); bucket count bounds group size, and a hot user only skews its
    own bucket."""
    import numpy as np

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        bucket = (hash64(t["user_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value": t["value"],
                "is_click": pc.equal(t["event_type"], "click"),
                "__bucket": pa.array(bucket),
            }
        )

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_click"]].sort_values("ts", kind="mergesort")
        right = g[~g["is_click"]].sort_values("ts", kind="mergesort")
        if not len(left) or not len(right):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "prev_event_id": pd.Series(dtype="int64"),
                    "prev_value": pd.Series(dtype="float64"),
                }
            )
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["event_id", "user_id", "ts", "value"]].rename(
                columns={"event_id": "prev_event_id", "value": "prev_value"}
            ),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["prev_event_id"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "prev_event_id": m["prev_event_id"].astype("int64"),
                "prev_value": m["prev_value"].astype("float64"),
            }
        )

    return (
        read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


def events_funnel(sf_dir: str) -> ray.data.Dataset:
    """Ordered funnel analysis (view -> click -> purchase): how many
    users reach each stage, where a stage counts only if it happens
    STRICTLY AFTER the user's qualifying time for the previous stage
    (first view, then first click after that view, then first purchase
    after that click).

    Same bucketed one-shuffle template as sessionize/as-of: users are
    co-located by ``hash(user_id) % B``; inside each bucket the whole
    chain is computed with pandas C groupby-min + merges — no per-user
    Python.  Each bucket emits 3 partial counts; a tiny Sum finalizes."""
    import numpy as np

    from ray.data.aggregate import Sum

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["view", "click", "purchase"])
        )
        t = t.filter(keep)
        bucket = (hash64(t["user_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
                "__bucket": pa.array(bucket),
            }
        )

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merges go through reset_index() frames: merging an EMPTY left
        # side against a named-index Series leaves the result's index
        # named "user_id", and the next groupby("user_id") then raises
        # "both an index level and a column label" (pandas 2.2) — a
        # bucket with no clicks/purchases must flow through cleanly
        t1 = (
            g[g["event_type"] == "view"]
            .groupby("user_id")["ts"].min().rename("t1").reset_index()
        )
        c = g[g["event_type"] == "click"].merge(t1, on="user_id")
        t2 = (
            c[c["ts"] > c["t1"]]
            .groupby("user_id")["ts"].min().rename("t2").reset_index()
        )
        p = g[g["event_type"] == "purchase"].merge(t2, on="user_id")
        t3 = p[p["ts"] > p["t2"]].groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {
                "stage": ["view", "click", "purchase"],
                "n_part": np.array([len(t1), len(t2), len(t3)], dtype=np.int64),
            }
        )

    return (
        read_events(sf_dir, columns=["user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .groupby("stage")
        .aggregate(Sum("n_part", alias_name="n_users"))
    )


# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot: one row per user with a count column per event type (fixed
    vocabulary) plus the total — the wide-format session feature table.

    Per batch, counts build with one ``np.add.at`` scatter over
    (user-code × type-index) — no per-row or per-type Python — and the
    shuffle then moves only the per-batch wide partials, finalized by a
    vectorized Sum per column (SURVEY.md §2.6 partial-then-finalize)."""
    import numpy as np

    n_types = len(EVENT_TYPES)
    type_arr = pa.array(EVENT_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"]).astype(np.int64)
        # unseen/null types fall into a shadow column that is never emitted
        tcode = np.asarray(
            pc.fill_null(pc.index_in(t["event_type"], value_set=type_arr), n_types + 1)
        ).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        counts = np.zeros((len(uniq), n_types + 2), dtype=np.int64)
        np.add.at(counts, (inv, tcode), 1)
        counts[:, n_types] = np.bincount(inv, minlength=len(uniq))
        out = {"user_id": pa.array(uniq)}
        for j, ty in enumerate(EVENT_TYPES):
            out[f"n_{ty}"] = pa.array(counts[:, j])
        out["n_total"] = pa.array(counts[:, n_types])
        return pa.table(out)

    from ray.data.aggregate import Sum as _Sum

    aggs = [_Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in EVENT_TYPES]
    aggs.append(_Sum("n_total", alias_name="n_total"))
    return (
        read_events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*aggs)
    )


def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Weekly cohort-retention matrix: users grouped by their first-active
    ISO week (cohort), counted in every week they return — the standard
    clickstream retention rollup over the reference's events stream.

    Shape: each batch first reduces to DISTINCT (user, week) pairs plus a
    per-user min-week partial (vectorized lexsort dedup — weeks per user
    per batch, not rows, cross the wire); ONE shuffle co-locates a user's
    partials by ``hash(user_id) % B``; each bucket resolves the true
    cohort (min over the user's weeks) and emits (cohort, week) partial
    counts; a tiny Sum over ≤ weeks² composite keys finalizes.  Week
    truncation is integer day arithmetic on the epoch grid (Monday-start,
    matching DuckDB ``date_trunc('week', ts)``) — exact, no tz/float."""
    import numpy as np

    from ray.data.aggregate import Sum

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)
    US_PER_DAY = np.int64(86_400_000_000)

    def tag(t: pa.Table) -> pa.Table:
        us = np.asarray(t["ts"].cast(pa.int64())).astype(np.int64)
        day = us // US_PER_DAY  # events are post-1970; floor == trunc
        week_day = day - (day + 3) % 7  # 1970-01-01 was a Thursday
        week_us = week_day * US_PER_DAY
        uid = np.asarray(t["user_id"]).astype(np.int64)
        order = np.lexsort((week_us, uid))
        u, w = uid[order], week_us[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        u, w = u[keep], w[keep]
        bucket = (
            hash64(pa.array(u)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "user_id": pa.array(u),
                "week_us": pa.array(w),
                "__bucket": pa.array(bucket),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        uw = g[["user_id", "week_us"]].drop_duplicates()  # across batches
        cohort = uw.groupby("user_id")["week_us"].min().rename("cohort_us")
        uw = uw.merge(cohort, left_on="user_id", right_index=True)
        out = (
            uw.groupby(["cohort_us", "week_us"], sort=False)
            .size()
            .reset_index(name="n_part")
        )
        out["n_part"] = out["n_part"].astype(np.int64)
        return out

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": t["cohort_us"].cast(pa.timestamp("us")),
                "week": t["week_us"].cast(pa.timestamp("us")),
                "n_users": t["n_users"],
            }
        )

    return (
        read_events(sf_dir, columns=["user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby(["cohort_us", "week_us"])
        .aggregate(Sum("n_part", alias_name="n_users"))
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


def events_interval_overlap(sf_dir: str) -> ray.data.Dataset:
    """Keyed INTERVAL-OVERLAP join — the second custom temporal-join
    operator Ray Data lacks (alongside the as-of join above): every click
    "attention window" [ts, ts+30min] matched against the SAME user's
    purchase "attribution window" [ts-10min, ts+10min] that it overlaps,
    emitting the exact overlap length.

    Shape: identical to ``events_asof_join`` — ONE shuffle on
    ``hash(user_id) % B`` co-locates both interval sets, and each bucket
    resolves ALL its users at once with one C-implemented equi-key merge
    followed by a vectorized overlap mask (closed-interval semantics:
    ``a.s <= b.e AND b.s <= a.e``).  Partitioning assumption: per-key
    interval counts are bounded (events per user), so the per-bucket
    key-expansion is output-proportional, never quadratic in the bucket.
    All arithmetic rides exact epoch-microsecond int64, so the overlap
    column hash-matches the DuckDB non-equi-join oracle."""
    import numpy as np

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)
    HALF_HOUR = 1_800_000_000  # us
    TEN_MIN = 600_000_000

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        us = np.asarray(t["ts"].cast(pa.int64()))
        is_click = np.asarray(pc.equal(t["event_type"], "click"))
        start = np.where(is_click, us, us - TEN_MIN)
        end = np.where(is_click, us + HALF_HOUR, us + TEN_MIN)
        bucket = (hash64(t["user_id"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "s": pa.array(start),
                "e": pa.array(end),
                "is_click": pa.array(is_click),
                "__bucket": pa.array(bucket),
            }
        )

    def overlap_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "a_id": pd.Series(dtype="int64"),
                "b_id": pd.Series(dtype="int64"),
                "overlap_us": pd.Series(dtype="int64"),
            }
        )
        a = g[g["is_click"]]
        b = g[~g["is_click"]]
        if not len(a) or not len(b):
            return empty
        m = a[["user_id", "event_id", "s", "e"]].merge(
            b[["user_id", "event_id", "s", "e"]],
            on="user_id",
            suffixes=("_a", "_b"),
        )
        if not len(m):
            return empty
        sa = m["s_a"].to_numpy()
        ea = m["e_a"].to_numpy()
        sb = m["s_b"].to_numpy()
        eb = m["e_b"].to_numpy()
        ok = (sa <= eb) & (sb <= ea)
        m = m[ok]
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "a_id": m["event_id_a"].astype("int64"),
                "b_id": m["event_id_b"].astype("int64"),
                "overlap_us": (
                    np.minimum(ea[ok], eb[ok]) - np.maximum(sa[ok], sb[ok])
                ).astype("int64"),
            }
        )

    return (
        read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(overlap_bucket, batch_format="pandas")
    )
