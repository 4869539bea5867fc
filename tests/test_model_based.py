"""Model-based interaction testing: a seeded random sequence of table ops
(append / merge / delete / update / compact / zorder / rename / partition
evolution / expire+vacuum) runs against BOTH the engine and an in-memory
dict model; after every op the visible relation must equal the model.

This is where cross-feature bugs live (column mapping x DV deletes x
migration x predicate DML) — the per-feature suites each pin one seam,
this drives them together."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table

SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("region", pa.string()),
    ]
)
SOURCES = ["web", "chat", "code"]
REGIONS = ["r0", "r1"]


def _rows(rng, start, n):
    out = {}
    for i in range(n):
        k = f"d-{start + i:07d}"
        toks = rng.integers(0, 50, size=int(rng.integers(1, 9))).astype(np.int32)
        out[k] = {
            "tokens": toks.tolist(),
            "n_tok": len(toks),
            "source": SOURCES[int(rng.integers(0, len(SOURCES)))],
            "region": REGIONS[int(rng.integers(0, len(REGIONS)))],
        }
    return out


def _to_table(rows: dict) -> pa.Table:
    ks = sorted(rows)
    return pa.table(
        {
            "doc_id": ks,
            "tokens": pa.array([rows[k]["tokens"] for k in ks], pa.list_(pa.int32())),
            "n_tok": pa.array([rows[k]["n_tok"] for k in ks], pa.int32()),
            "source": [rows[k]["source"] for k in ks],
            "region": [rows[k]["region"] for k in ks],
        }
    )


def _collect(t: Table, tok_col: str, ntk_col: str) -> dict:
    import ray

    blocks = [b for b in ray.get(t.scan().to_arrow_refs()) if b.num_rows]
    out = {}
    for b in blocks:
        for i in range(b.num_rows):
            out[b["doc_id"][i].as_py()] = {
                "tokens": b[tok_col][i].as_py(),
                "n_tok": b[ntk_col][i].as_py(),
                "source": b["source"][i].as_py(),
                "region": b["region"][i].as_py(),
            }
    return out


@pytest.mark.parametrize("seed", [5, 11, 23, 47, 77])
@pytest.mark.timeout(900)
def test_random_op_sequence_matches_model(tmp_path, seed):
    rng = np.random.default_rng(seed)
    t = Table.create(str(tmp_path / f"model{seed}"), schema=SCHEMA)
    model = _rows(rng, 0, 120)
    t.append(_to_table(model))
    next_key = 1000
    tok_col = "tokens"
    renamed = False
    evolved = False

    ops = ["append", "merge", "delete_keys", "delete_where", "update",
           "compact", "zorder", "rename", "evolve", "expire_vacuum", "mor",
           "dedup", "merge_when"]
    history = []
    for step in range(14):
        op = ops[int(rng.integers(0, len(ops)))]
        history.append(op)
        if op == "append":
            fresh = _rows(rng, next_key, int(rng.integers(5, 30)))
            next_key += 100
            tbl = _to_table(fresh).rename_columns(
                ["doc_id", tok_col, "length" if renamed else "n_tok",
                 "source", "region"]
            )
            t.append(tbl)
            model.update(fresh)
        elif op == "merge":
            if not model:
                continue
            keys = list(model)
            pick = [keys[i] for i in rng.choice(len(keys), size=min(9, len(keys)), replace=False)]
            upd = {}
            for k in pick:
                toks = rng.integers(0, 50, size=int(rng.integers(1, 9))).astype(np.int32)
                upd[k] = {
                    "tokens": toks.tolist(),
                    "n_tok": len(toks),
                    "source": model[k]["source"],
                    "region": model[k]["region"],
                }
            t.merge(
                _to_table(upd).rename_columns(
                    ["doc_id", tok_col, "length" if renamed else "n_tok",
                     "source", "region"]
                )
            )
            model.update(upd)
        elif op in ("delete_keys", "mor"):
            if not model:
                continue
            keys = list(model)
            pick = [keys[i] for i in rng.choice(len(keys), size=min(7, len(keys)), replace=False)]
            t.delete(keys=pick, mode="mor" if op == "mor" else "cow")
            for k in pick:
                model.pop(k)
        elif op == "delete_where":
            ntk = "length" if renamed else "n_tok"
            cut = int(rng.integers(1, 9))
            v = t.delete(where=f"{ntk} >= {cut} AND source = 'code'")
            doomed = [
                k for k, r in model.items()
                if r["n_tok"] >= cut and r["source"] == "code"
            ]
            assert (v is not None) == bool(doomed)
            for k in doomed:
                model.pop(k)
        elif op == "update":
            ntk = "length" if renamed else "n_tok"
            t.update(
                set_rules=[{"column": "source", "op": "set", "value": "web"}],
                where=f"{ntk} <= 2",
            )
            for r in model.values():
                if r["n_tok"] <= 2:
                    r["source"] = "web"
        elif op == "compact":
            t.compact(target_file_bytes=1 << 20)
        elif op == "zorder":
            part = t.partition_col
            ntk = "length" if renamed else "n_tok"
            t.zorder(dims=(part, ntk, "doc_id"), target_file_bytes=1 << 20)
        elif op == "rename" and not renamed:
            t.rename_column("tokens", "token_ids")
            tok_col = "token_ids"
            t.rename_column("n_tok", "length")
            renamed = True
        elif op == "evolve" and not evolved:
            t.evolve_partitioning("region")
            evolved = True
        elif op == "dedup":
            groups: dict = {}
            for k, r in model.items():
                groups.setdefault(tuple(r["tokens"]), []).append(k)
            losers = [k for g in groups.values() for k in sorted(g)[1:]]
            v = t.dedup_rows()
            assert (v is not None) == bool(losers)
            for k in losers:
                model.pop(k)
        elif op == "merge_when":
            if not model:
                continue
            keys = list(model)
            pick = [keys[i] for i in rng.choice(len(keys), size=min(8, len(keys)), replace=False)]
            fresh = _rows(rng, next_key, 4)
            next_key += 100
            src = {}
            for k in pick:
                toks = rng.integers(0, 50, size=int(rng.integers(1, 9))).astype(np.int32)
                src[k] = {
                    "tokens": toks.tolist(),
                    "n_tok": len(toks),
                    "source": model[k]["source"],
                    "region": model[k]["region"],
                }
            src.update(fresh)
            cut = int(rng.integers(1, 9))
            action = "update" if int(rng.integers(0, 2)) else "delete"
            ntk = "length" if renamed else "n_tok"
            t.merge(
                _to_table(src).rename_columns(
                    ["doc_id", tok_col, ntk, "source", "region"]
                ),
                matched_condition=f"{ntk} >= {cut}",
                matched_action=action,
            )
            for k in pick:  # clause evaluated on the TARGET row
                if model[k]["n_tok"] >= cut:
                    if action == "update":
                        model[k] = src[k]
                    else:
                        model.pop(k)
            model.update(fresh)  # unmatched keys always insert
        elif op == "expire_vacuum":
            if t.version() > 1:
                t.expire_snapshots(keep_last=1)
                t.vacuum(min_age_seconds=0.0)
        got = _collect(t, tok_col, "length" if renamed else "n_tok")
        assert got == model, f"divergence after step {step}: {history}"
        if step % 5 == 0:
            # the ad-hoc SQL surface must see the SAME relation the scan
            # does, whatever op mix produced the snapshot (DVs, renames,
            # partition evolution, conditioned merges, ...)
            n = t.sql("SELECT count(*) AS n FROM t")["n"][0].as_py()
            assert n == len(model), f"sql count {n} != {len(model)}: {history}"
