"""Day-in-the-life lifecycle simulation: waves of appends interleaved
with EVERY maintenance op (compact, incremental zorder, merge, delete,
manifest rewrite, expire, vacuum), with the expected table state tracked
as a plain dict in the test — so the final per-row token-array equality
exercises the INTERPLAY of features (incremental clustering over fresh
appends, compaction idempotency between waves, merge keep-latest over
already-clustered files, vacuum after expire) rather than each op in
isolation, which is how a real ingest loop drives the engine."""

import numpy as np
import pyarrow as pa
import ray

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import gen_tokens_chunk


def _expected_from(chunks):
    exp = {}
    for t in chunks:
        for d, tok in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
            exp[d] = tok
    return exp


def _scan_dict(table: Table) -> dict:
    parts = [t for t in ray.get(table.scan().to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts, promote_options="default")
    return dict(zip(tbl["doc_id"].to_pylist(), tbl["tokens"].to_pylist()))


def test_wave_lifecycle(tmp_path):
    root = str(tmp_path / "tokens")
    table = Table.create(root)
    exp: dict = {}

    # ---- wave 1: two small appends, then compact ----------------------
    w1a = gen_tokens_chunk(0, 0, 400)
    w1b = gen_tokens_chunk(1, 400, 400)
    table.append(w1a, rows_per_file=50)
    table.append(w1b, rows_per_file=50)
    exp.update(_expected_from([w1a, w1b]))
    v_wave1 = table.version()
    table.compact(target_file_bytes=1 << 20)
    assert _scan_dict(table) == exp

    # compact rerun between waves converges (no commit stacking)
    v = table.version()
    assert table.compact(target_file_bytes=1 << 20) in (None, v)
    assert table.version() == v

    # ---- wave 2: append + INCREMENTAL zorder --------------------------
    w2 = gen_tokens_chunk(2, 800, 400)
    table.append(w2, rows_per_file=50)
    exp.update(_expected_from([w2]))
    table.zorder(target_file_bytes=1 << 20, incremental=True)
    assert _scan_dict(table) == exp

    # second incremental zorder with no new data: no-op
    v = table.version()
    assert table.zorder(target_file_bytes=1 << 20, incremental=True) is None
    assert table.version() == v

    # ---- wave 3: merge corrections over the clustered table -----------
    upd = gen_tokens_chunk(3, 0, 100)  # overwrites doc-0..99 with new tokens
    table.merge(upd)
    exp.update(_expected_from([upd]))
    assert _scan_dict(table) == exp

    # ---- wave 4: delete a key range + more data -----------------------
    dead = [f"doc-{i:012d}" for i in range(50, 70)]
    table.delete(keys=dead)
    for d in dead:
        exp.pop(d)
    w4 = gen_tokens_chunk(4, 1200, 300)
    table.append(w4, rows_per_file=50)
    exp.update(_expected_from([w4]))
    table.zorder(target_file_bytes=1 << 20, incremental=True)
    assert _scan_dict(table) == exp

    # ---- housekeeping: manifest rewrite, expire, vacuum ---------------
    table.rewrite_manifests()
    table.expire_snapshots(keep_last=2)
    table.vacuum(min_age_seconds=0.0)
    assert _scan_dict(table) == exp

    # no orphans: on-disk parquet == files referenced by retained versions
    referenced = {f.path for v_ in table.log.versions() for f in table.files(v_)}
    on_disk = {
        str(p.relative_to(table.root))
        for p in table.root.glob("source=*/*.parquet")
    }
    assert on_disk == referenced

    # history metadata survives the churn and stays ordered
    hist = table.metadata_table("history").to_pydict()
    assert hist["version"] == sorted(hist["version"])
    assert hist["rows"][-1] == len(exp)

    # wave-1 version was expired; time travel to it must fail loudly
    import pytest

    with pytest.raises(Exception):
        table.scan(version=v_wave1).count()
