"""Thin table catalog: Iceberg when the runtime ships it, day-partitioned
parquet paths otherwise.

The reference's physical layout is a day-partitioned archive directory tree
(/root/reference/archiver/filemgr.go:94-104: one file per day, date in the
path). The warehouse-native analog is an Iceberg table partitioned by an
identity ``day`` column plus ``bucket(N, conv_id)`` — day pruning for
retention plus bucketed conv co-location so rollup/pack shuffles become
partition-local. This module provides that DDL path when an Iceberg catalog
is configured, and degrades to the same ``day=YYYY-MM-DD`` parquet
directory convention otherwise (partition pruning still applies via
Hive-style paths; bucketing is unavailable path-based and noted as such).

The layout CONTRACT is the identity ``day_col`` partition: every read path
(read / read_day / days) is expressed against it, in both physical layouts.
``partition_by`` accepts arbitrary extra transforms (e.g. ``days(ts)``) but
must still include the identity ``day_col`` for the read paths to hold.

Every writer in the engine (checkpointed rollup job, tier materialization)
routes through ``Catalog`` so swapping the physical layer is one object.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: day strings are interpolated into Iceberg SQL (DELETE ... WHERE day =
#: '{day}') and into day=... directory paths — validate them like _IDENT
#: validates names, or a stray quote breaks the SQL and a path fragment
#: ("../x") escapes the table root
#: \Z, not $ — $ would accept a trailing newline into the SQL/path
_DAY = re.compile(r"\A\d{4}-\d{2}-\d{2}\Z")

#: CREATE failures that mean "this runtime has no Iceberg" (anything else
#: must surface — see ensure_table)
_NO_ICEBERG_MARKERS = (
    "Failed to find data source: iceberg",
    "DATA_SOURCE_NOT_FOUND",
    "ClassNotFoundException",
    "Cannot find catalog plugin",
)


class Catalog:
    """``kind`` is 'iceberg' or 'parquet' (decided per table at create)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        iceberg_catalog: str | None = None,
        bucket_n: int = 16,
        day_col: str = "day",
    ):
        self.spark = spark
        self.root = root
        self.iceberg_catalog = iceberg_catalog
        self.bucket_n = bucket_n
        self.day_col = day_col
        self.kind: dict[str, str] = {}
        # schema recorded at ensure_table time; lets the parquet fallback
        # answer an empty read before the first committed day (symmetric
        # with Iceberg, where reading an empty table returns an empty DF)
        self._schema: dict = {}

    def _is_catalog_table(self, name: str) -> bool:
        """True only for a real (non-temp) catalog table named ``name`` —
        a same-named temp view must not be mistaken for an Iceberg table.
        Only a definitive not-found answers False; bad names and transient
        catalog errors SURFACE (a swallowed metastore hiccup would silently
        reclassify an Iceberg table as parquet)."""
        ident = self._ident(name)  # ValueError on bad names surfaces
        try:
            t = self.spark.catalog.getTable(ident)
        except Exception as e:
            msg = str(e)
            if "TABLE_OR_VIEW_NOT_FOUND" in msg or "cannot be found" in msg or (
                "Table" in msg and "not found" in msg
            ):
                return False
            raise
        return (t.tableType or "").upper() not in ("", "TEMPORARY", "TEMP_VIEW")

    def _kind(self, name: str) -> str:
        """Layout of ``name`` for read paths. A fresh instance rediscovers an
        existing Iceberg table via the catalog; a MISS is answered 'parquet'
        but deliberately NOT cached, so a later ensure_table still attempts
        the Iceberg CREATE (caching the miss would silently force parquet
        forever on an Iceberg runtime)."""
        if name in self.kind:
            return self.kind[name]
        if self._is_catalog_table(name):
            self.kind[name] = "iceberg"
            return "iceberg"
        return "parquet"

    # -- identifiers --------------------------------------------------------

    def _ident(self, name: str) -> str:
        if not _IDENT.match(name):
            raise ValueError(f"bad table name: {name!r}")
        return f"{self.iceberg_catalog}.{name}" if self.iceberg_catalog else name

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    @staticmethod
    def _day(day: str) -> str:
        if not _DAY.match(day):
            raise ValueError(f"bad day string (want YYYY-MM-DD): {day!r}")
        return day

    # -- DDL ----------------------------------------------------------------

    def ensure_table(
        self,
        name: str,
        like: DataFrame,
        partition_by: tuple[str, ...] | None = None,
        bucket_col: str | None = "conv_id",
    ) -> str:
        """Create the table if missing; returns the chosen kind.

        Iceberg DDL: ``PARTITIONED BY (<day_col>, bucket(N, <bucket_col>))``
        by default — the identity ``day_col`` partition is the layout
        contract the read paths rely on. ``partition_by`` may override with
        explicit transforms but should still include ``day_col``. Parquet
        fallback: the directory is created lazily by the first write.
        """
        self._schema[name] = like.schema
        if name in self.kind:
            return self.kind[name]
        ddl_cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in like.schema.fields
        )
        if partition_by is not None:
            parts = list(partition_by)
        else:
            parts = [self.day_col]
            if bucket_col:
                parts.append(f"bucket({self.bucket_n}, {bucket_col})")
        ident = self._ident(name)  # validate BEFORE the fallback try
        try:
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {ident} ({ddl_cols}) "
                f"USING iceberg PARTITIONED BY ({', '.join(parts)}) "
                f"TBLPROPERTIES ('format-version'='2')"
            )
            self.kind[name] = "iceberg"
        except Exception as e:
            # fall back ONLY when the runtime genuinely lacks Iceberg; any
            # other CREATE failure (metastore hiccup, bad transform) must
            # surface, or writes would silently split across two layouts
            if not any(m in str(e) for m in _NO_ICEBERG_MARKERS):
                raise
            self.kind[name] = "parquet"
        return self.kind[name]

    # -- IO -----------------------------------------------------------------

    def overwrite_day(self, name: str, df: DataFrame, day: str) -> None:
        """Idempotently replace one day partition (the resume-safe write
        unit: re-running a day after a crash overwrites, never duplicates)."""
        self._day(day)
        if self._kind(name) == "iceberg":
            df.writeTo(self._ident(name)).overwritePartitions()
        else:
            df.write.mode("overwrite").parquet(
                os.path.join(self._path(name), f"{self.day_col}={day}")
            )

    def read(self, name: str) -> DataFrame:
        if self._kind(name) == "iceberg":
            return self.spark.table(self._ident(name))
        path = self._path(name)
        if not self.days(name):
            # a table that exists (ensure_table ran) but has no committed
            # day yet: answer an empty DataFrame from the recorded schema
            # instead of letting the day=* glob raise PATH_NOT_FOUND —
            # symmetric with the Iceberg branch. Type caveat: when the
            # recorded schema carries no day column, the post-commit read
            # infers day from the day=YYYY-MM-DD directory names, which
            # Spark types as DATE — so the synthesized column is DATE here
            # to keep the pre/post-commit schemas identical. (When the data
            # files DO carry a day column — the checkpointed-rollup layout —
            # the data column and its recorded type win on both sides.)
            schema = self._schema.get(name)
            if schema is None:
                raise FileNotFoundError(
                    f"catalog table {name!r} has no committed partitions and "
                    f"no recorded schema (ensure_table not called on this "
                    f"Catalog instance); nothing to read at {path}"
                )
            if self.day_col not in schema.fieldNames():
                schema = schema.add(self.day_col, "date")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.option("basePath", path).parquet(
            f"{path}/{self.day_col}=*"
        )

    def read_day(self, name: str, day: str) -> DataFrame:
        """Day-pruned read: Iceberg prunes on the ``day_col`` identity
        partition; the parquet layout prunes on the day= directory — either
        way a metadata-only selection, never a row scan."""
        self._day(day)
        return self.read(name).where(F.col(self.day_col) == F.lit(day))

    def compact_day(
        self,
        name: str,
        day: str,
        target_files: int = 1,
        cluster_by: list | None = None,
        layout: str = "sort",
    ) -> dict:
        """Rewrite one committed day partition into ``target_files`` files.

        Maintenance twin of ``overwrite_day``: each checkpointed commit
        writes a task-count's worth of files into its day, and at archive
        scale (10^5 days x many commits) the small files dominate open/seek
        cost long before data size does. Compaction is day-scoped — the same
        resume unit as the writes — so it can run day-by-day behind the
        ingest frontier without touching open days.

        The day's rows are pinned with an eager ``localCheckpoint`` before
        the overwrite (the parquet layout would otherwise overwrite the very
        files the plan is still reading; Iceberg versions snapshots, but the
        pin keeps one code path and one read of the old files). Returns
        ``{"files_before": n, "files_after": m, "rows": r}``.

        Iceberg caveat: on the default bucketed layout (day +
        bucket(N, conv_id)) the physical floor is one file per populated
        bucket, so ``files_after`` lands at ~N regardless of
        ``target_files`` — the rewrite still consolidates the many
        per-commit files within each bucket. Iceberg runtimes with
        maintenance procedures should prefer ``rewrite_data_files``; this
        method is the engine-portable form (reference analog: the
        archiver's one-file-per-day invariant,
        /root/reference/archiver/filemgr.go:94-104).
        """
        if target_files < 1:
            raise ValueError(f"target_files must be >= 1, got {target_files}")
        if day not in self.days(name):
            raise ValueError(
                f"no committed day {day!r} in table {name!r}; compacting a "
                f"missing day would create a phantom empty partition"
            )
        if layout not in ("sort", "zorder"):
            raise ValueError(f"layout must be 'sort' or 'zorder', got {layout!r}")
        before = self.day_file_count(name, day)
        df = self.read_day(name, day).localCheckpoint()
        rows = df.count()
        if cluster_by:
            # compaction is ALSO the layout fix: "sort" = compound lexical
            # sort (perfect row-group stats on the leading column — the
            # right choice when probes always carry it); "zorder" = Morton
            # clustering (data/layout.py — balances stats across ALL listed
            # columns for mixed probe shapes; strings rank by hash there,
            # so prefer numeric/time columns for stats-visible gains)
            if layout == "zorder":
                from tmframe_spark.data.layout import zorder_clustered

                out = zorder_clustered(df, list(cluster_by), num_files=target_files)
            else:
                out = df.repartition(target_files).sortWithinPartitions(*cluster_by)
        else:
            out = df.repartition(target_files)
        self.overwrite_day(name, out, day)
        return {
            "files_before": before,
            "files_after": self.day_file_count(name, day),
            "rows": rows,
        }

    def day_file_count(self, name: str, day: str) -> int:
        """Data files currently serving one day partition."""
        self._day(day)
        if self._kind(name) == "iceberg":
            return self.spark.sql(
                f"SELECT count(*) AS n FROM {self._ident(name)}.files "
                f"WHERE partition.{self.day_col} = '{day}'"
            ).collect()[0]["n"]
        d = os.path.join(self._path(name), f"{self.day_col}={day}")
        if not os.path.isdir(d):
            return 0
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    def drop_day(self, name: str, day: str) -> bool:
        """Drop one committed day partition; True if it existed.

        The vacuum primitive behind the retention tiers: because the layout
        contract is the identity ``day_col`` partition, expiring a day is a
        partition-aligned DELETE (Iceberg rewrites only manifests — a
        metadata operation) or a directory remove (parquet fallback) —
        never a row scan, at any archive size. For bulk expiry prefer
        ``drop_days_before`` (one metadata listing + one ranged DELETE,
        instead of per-day existence checks).
        """
        self._day(day)
        if self._kind(name) == "iceberg":
            if day not in self.days(name):
                return False
            self.spark.sql(
                f"DELETE FROM {self._ident(name)} "
                f"WHERE {self.day_col} = '{day}'"
            )
            return True
        d = os.path.join(self._path(name), f"{self.day_col}={day}")
        if not os.path.isdir(d):
            return False
        shutil.rmtree(d)
        return True

    def drop_days_before(self, name: str, cutoff_day: str) -> list[str]:
        """Drop every committed day partition older than ``cutoff_day``
        (exclusive); returns the dropped days, oldest first.

        One metadata listing decides the set; Iceberg then expires the whole
        range in a single partition-aligned ranged DELETE (one manifest
        rewrite for K days, not K), the parquet fallback removes each day
        directory. ISO-8601 day strings order like the dates they name.
        """
        self._day(cutoff_day)
        dropped = [d for d in self.days(name) if d < cutoff_day]
        if not dropped:
            return []
        if self._kind(name) == "iceberg":
            self.spark.sql(
                f"DELETE FROM {self._ident(name)} "
                f"WHERE {self.day_col} < '{cutoff_day}'"
            )
        else:
            for d in dropped:
                shutil.rmtree(os.path.join(self._path(name), f"{self.day_col}={d}"))
        return dropped

    def days(self, name: str) -> list[str]:
        """Committed day partitions (metadata listing, no data read).

        Iceberg: the .partitions metadata table exposes identity partition
        sources as ``partition.<col>`` — this matches the default layout
        this class creates. A table created with custom transforms (e.g.
        days(ts) -> partition.ts_day) needs its own listing."""
        if self._kind(name) == "iceberg":
            rows = self.spark.sql(
                f"SELECT DISTINCT partition.{self.day_col} AS d FROM "
                f"{self._ident(name)}.partitions"
            ).collect()
            return sorted(str(r["d"]) for r in rows)
        path = self._path(name)
        if not os.path.isdir(path):
            return []
        pre = f"{self.day_col}="
        return sorted(
            p.split("=", 1)[1] for p in os.listdir(path) if p.startswith(pre)
        )
