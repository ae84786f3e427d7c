"""milvus_cdc_spark — a PySpark-native analytics/CDC engine.

A from-scratch rebuild of the capabilities of zilliztech/milvus-cdc
(reference at /root/reference, Go) as an idiomatic PySpark package:

- ``catalog``   : table/metadata registry (replaces the reference's etcd
                  snapshot+watch source, core/reader/etcd_op.go).
- ``oplog``     : the canonical CDC op-event model (MsgPack stream flattened
                  to rows, core/api/param.go + msgdispatcher).
- ``operators`` : batch DataFrame implementations of the reference's dataflow
                  operators (filters, remaps, joins, barriers, windows,
                  replay/apply) — SURVEY.md §2.3-§2.7.
- ``functions`` : scalar function surface (§2.8) + text/vector functions for
                  the LLM-pipeline extensions.
- ``analytics`` : dedup / similarity-search / text-analysis / multimodal
                  operators designed for 100 TB scale.
- ``streaming`` : Structured Streaming pipeline (watermarks, monotonic-ts
                  repair, barriers, trigger policy) — SURVEY.md §2.9.
- ``control``   : task control plane (create/pause/resume/position/list) over
                  a task-registry table + StreamingQueryManager.

Everything is DataFrame-first: logical plans are declared via the DataFrame /
SQL API and Catalyst picks physical strategies (broadcast vs sort-merge joins,
partial aggregation, whole-stage codegen). Python UDFs appear only where
built-ins genuinely cannot express the semantics, and then as Arrow-batched
pandas UDFs.
"""

__version__ = "0.1.0"
