"""tmframe_spark — a PySpark-native time-series rollup / downsample /
retention engine with TMFRAME-style framed binary blocks.

Brand-new engine (NOT a port) re-expressing the semantics of the
glycerine/tmframe reference (Go, at /root/reference) on Spark DataFrames:

- frame codec (PTI-tagged, evtnum namespace, 8ns timestamps) as a pure-numpy
  single-node oracle plus vectorized Arrow/pandas UDFs for the distributed path
- delta-of-delta timestamp + Gorilla-XOR value compression inside packed
  per-(conv_id, bucket) binary block columns (Facebook Gorilla, VLDB'15)
- continuous aggregates (turn-rate / token-volume / role-mix) at 1m/1h/1d
  retention tiers with gap-fill of missing windows
- as-of point lookups (4 tie variants), time-ordered merge, windowed dedup
- skew salting + AQE for hot conversations; per-partition checkpoint manifests
- archive lifecycle: zone-map range serving (decode only overlapping blocks),
  tiered continuous-aggregate reads, retention vacuum via partition-aligned
  deletes, day compaction behind the ingest frontier (jobs/maintenance_job.py)
"""

__version__ = "0.1.0"
