"""Iceberg table IO (north rule: Iceberg tables bucketed by url hash).

This sandbox ships no Iceberg runtime jar (re-probed round 6, 2026-08-17:
`getent hosts repo1.maven.org` → no DNS, no iceberg*.jar anywhere on
disk), so the module degrades
explicitly: :func:`iceberg_available` probes the Spark session for the
catalog plugin; the writer uses real Iceberg DDL/DataFrameWriterV2 when the
plugin is present and otherwise raises ``IcebergUnavailable`` so callers
fall back to :func:`facturas_spark.sources.io.write_bucketed` (the
``xxhash64(url) %% N`` parquet layout — numerically the same bucket
assignment Iceberg's ``bucket(N, url)`` transform produces is NOT
guaranteed, but the *distribution property* the pipeline relies on — hot
hosts spread uniformly because the full url is hashed — is identical).

Cluster deployment (documented, exercised when the jar is on the
classpath):

    spark-submit --py-files facturas_spark_pkg.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> \\
      jobs/extract_job.py ...

Reference parity: the reference persists per-document rows into Postgres
tables (process-invoice/index.ts inserts into ``documentos`` /
``datos_extraidos_facturas``); at 10^12-document scale the equivalent
store is a partitioned Iceberg table — same rows, lakehouse layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    """Raised when no Iceberg catalog is configured on the session."""


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    """True iff ``catalog`` resolves to a live Iceberg SparkCatalog."""
    conf = spark.conf
    try:
        impl = conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    if not impl or "iceberg" not in impl.lower():
        return False
    try:  # the jar must actually be on the classpath, not just configured
        # (py4j attribute access is lazy and never raises — Class.forName
        # is the real probe)
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def create_pages_table(
    spark: SparkSession,
    table: str = "lake.crawl.pages_extracted",
    n_buckets: int = 256,
) -> None:
    """CREATE TABLE IF NOT EXISTS with the contract schema, partitioned by
    ``bucket(N, url)`` — the Iceberg-native form of the parquet emulation's
    ``xxhash64(url) %% N`` column. Bucketing by the FULL url (not host)
    spreads Zipf-skewed hosts uniformly across partitions."""
    if not iceberg_available(spark, table.split(".", 1)[0]):
        raise IcebergUnavailable(f"no Iceberg catalog for {table!r}")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {table} (
          url STRING,
          warc_ts TIMESTAMP,
          lang STRING,
          tipo_documento STRING,
          texto_extraido STRING,
          proveedor_nombre STRING,
          proveedor_cif STRING,
          numero_factura STRING,
          fecha_factura DATE,
          total_factura DOUBLE,
          base_imponible DOUBLE,
          cuota_iva DOUBLE,
          tipo_iva DOUBLE,
          confianza_global DOUBLE,
          requiere_revision BOOLEAN
        )
        USING iceberg
        PARTITIONED BY (bucket({n_buckets}, url))
        TBLPROPERTIES (
          'write.distribution-mode' = 'hash',
          'write.target-file-size-bytes' = '536870912'
        )
        """
    )


def write_pages(
    df: DataFrame,
    table: str = "lake.crawl.pages_extracted",
) -> None:
    """Idempotent per-run write: ``overwritePartitions`` replaces exactly
    the buckets this run touched (dynamic overwrite), so a resumed job
    re-emitting a partition converges instead of duplicating — the
    lakehouse analogue of ``io.LineageManifest`` + rerun-skip."""
    spark = df.sparkSession
    if not iceberg_available(spark, table.split(".", 1)[0]):
        raise IcebergUnavailable(f"no Iceberg catalog for {table!r}")
    df.writeTo(table).overwritePartitions()


def incremental_pages(
    spark: SparkSession,
    table: str = "lake.crawl.pages_extracted",
    start_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental read between snapshots (the resume/streaming source):
    only files appended after ``start_snapshot_id`` are scanned — the
    scale-out replacement for the reference's row-level 'procesado'
    state machine."""
    if not iceberg_available(spark, table.split(".", 1)[0]):
        raise IcebergUnavailable(f"no Iceberg catalog for {table!r}")
    reader = spark.read.format("iceberg")
    if start_snapshot_id is not None:
        reader = reader.option("start-snapshot-id", str(start_snapshot_id))
    return reader.load(table)
