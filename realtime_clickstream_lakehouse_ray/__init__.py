"""Ray-Data-native lakehouse table-maintenance engine.

A brand-new engine (NOT a port) with the data-processing capabilities of the
reference streaming lakehouse (`waleadekoya/realtime-clickstream-lakehouse`,
read-only at /root/reference): schema-enforced ingest into an ACID,
partitioned, snapshot-isolated, checkpointed Parquet table with Delta-style
maintenance (compaction / OPTIMIZE, Z-order clustering, MERGE INTO, snapshot
expire / VACUUM, time travel) — re-expressed as idiomatic Ray Data pipelines
(`ray.data.Dataset` -> `map_batches` over zero-copy Arrow batches, actor
pools for stateful file-rewrite stages) over Parquet tables of pre-tokenized
training sequences `(doc_id: string, tokens: list<int32>, n_tok: int32,
source: string)`.

Layout:
  - ``schema``     table schemas + batch conformance (reference M9)
  - ``functions``  vectorized kernels: stable hashing, Z-order interleave,
                   timestamp parsing, text statistics, minhash/simhash
  - ``sources``    deterministic synthetic-table generators, read helpers
  - ``state``      snapshot log (ACID commit, time travel) + checkpoint
                   manifests (per-partition lineage, idempotent resume)
  - ``stages``     map_batches stages (conform, file writer, bin rewriter,
                   z-key, text analysis, dedup, ANN, multimodal stubs)
  - ``pipelines``  the table-maintenance API (`Table`) and the query
                   pipelines exposed through ``__ray_entry__``

None of this package calls ``ray.init()`` — sessions are owned by the
driver / pytest fixture / bench.py, per the build contract.
"""

from realtime_clickstream_lakehouse_ray.schema import TOKENS_SCHEMA, conform_table

__all__ = ["TOKENS_SCHEMA", "conform_table"]
