"""Table sink abstraction — the Iceberg-shaped seam for index persistence.

The north rule targets Iceberg tables; this sandbox ships no Iceberg jars, so
the default sink is parquet-on-directory with the SAME interface an Iceberg
catalog sink exposes: named tables, overwrite/append modes, optional
partition columns, read-back.  Swapping storage is one constructor — no
builder/lineage code changes:

    build_index(spark, pages, out_dir)                       # parquet (default)
    build_index(spark, pages, out_dir, sink=IcebergSink("cat.db.idx"))

``IcebergSink`` maps the calls onto Spark's DataFrameWriterV2 / catalog-table
API (createOrReplace / append / spark.table) — the standard public Iceberg
integration surface — and fails with a clear error when no Iceberg catalog is
configured in the session.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableSink:
    """Named-table writer/reader for the index layout's tables
    (``postings``, ``doc_stats``, ``doc_map``, ``tf``, ...)."""

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        options: dict[str, str] | None = None,
    ) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        raise NotImplementedError

    def location(self, table: str) -> str:
        """A string identifying the table's storage (path or catalog name)."""
        raise NotImplementedError


class ParquetSink(TableSink):
    """Directory-per-table parquet layout (the sandbox default)."""

    def __init__(self, root: str):
        self.root = root

    def write(self, df, table, mode="overwrite", partition_by=None, options=None):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(self.location(table))

    def read(self, spark, table):
        return spark.read.parquet(self.location(table))

    def location(self, table):
        return os.path.join(self.root, table)


class IcebergSink(TableSink):
    """Iceberg catalog tables via the public DataFrameWriterV2 API.

    ``prefix`` is the catalog-qualified namespace (e.g. ``cat.db.search_idx``);
    each index table becomes ``{prefix}_{table}``.  Requires an Iceberg
    catalog configured on the session (``spark.sql.catalog.<name>`` +
    iceberg-spark-runtime on the classpath) — absent that, writes raise with
    an actionable message rather than silently falling back."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def _qualified(self, table: str) -> str:
        return f"{self.prefix}_{table}"

    def write(self, df, table, mode="overwrite", partition_by=None, options=None):
        try:
            w = df.writeTo(self._qualified(table))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            for k, v in (options or {}).items():
                w = w.option(k, v)
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
        except Exception as e:  # noqa: BLE001 — surface the real cause
            raise RuntimeError(
                f"IcebergSink write to {self._qualified(table)} failed "
                f"({type(e).__name__}; original cause chained below). "
                "If the table name could not be resolved, check that an "
                "Iceberg catalog is configured on this SparkSession "
                "(spark.sql.catalog.* + iceberg-spark-runtime jar)."
            ) from e

    def read(self, spark, table):
        return spark.table(self._qualified(table))

    def location(self, table):
        return self._qualified(table)
