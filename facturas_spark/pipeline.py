"""End-to-end extraction pipeline over a Common-Crawl-style ``pages`` table.

One declarative plan, Catalyst-optimizable end to end:

    pages(url, warc_ts, html, text, lang)
      -> main-content text            (Arrow UDF, only where text is null)
      -> classify factura/albaran     (Arrow UDF)
      -> field extraction struct      (Arrow UDF)
      -> flat typed columns           (built-in projections)

Scale notes (the part that matters at 10^12 docs):
- The three UDFs run in a single stage: no shuffle between them — Spark
  pipelines the projections over the same Arrow batches. Input partitioning
  is preserved from the scan; there is NO shuffle in this job at all.
- Skewed hosts do not skew this stage (extraction is per-row, cost scales
  with bytes not keys). Skew matters for the downstream joins/aggregations,
  handled in analytics/matching via AQE + salting (see matching/cotejo.py).
- ``salt_bucket`` derives the write-side bucket: hash(url) mod n_buckets —
  the Iceberg ``bucket(N, url)`` layout from SURVEY §2.1 S5, emulated with
  parquet partitioning in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facturas_spark.extraction.udf import (
    classify_udf,
    extract_fields_udf,
    extract_products_udf,
    main_text_udf,
)

__all__ = [
    "extract_pages",
    "extract_products_table",
    "with_salt_bucket",
    "extraction_metrics",
]


def extract_pages(pages: DataFrame) -> DataFrame:
    """Run the full extraction over a pages DataFrame.

    Returns one row per input page with columns:
    url, warc_ts, lang, extracted_text, tipo_documento,
    confianza_clasificacion, + the 12 extracted field columns (flattened).
    """
    out = (
        pages
        .withColumn("extracted_text", main_text_udf(F.col("html"), F.col("text")))
        .withColumn("_cls", classify_udf(F.col("extracted_text")))
        .withColumn("_f", extract_fields_udf(F.col("extracted_text")))
        .select(
            "url",
            "warc_ts",
            "lang",
            "extracted_text",
            F.col("_cls.tipo_documento").alias("tipo_documento"),
            F.col("_cls.confianza_clasificacion").alias("confianza_clasificacion"),
            F.col("_f.*"),
        )
    )
    return out


def extract_products_table(extracted: DataFrame) -> DataFrame:
    """Line-item child table: posexplode of the per-doc product array
    (SURVEY §2.4). Input is :func:`extract_pages` output (needs
    extracted_text + tipo_iva). Still a single stage — the UDF + explode
    pipeline over the same partitioning; one row per product line."""
    prods = extracted.withColumn(
        "_p", extract_products_udf(F.col("extracted_text"), F.col("tipo_iva"))
    )
    return prods.select(
        "url",
        "tipo_documento",
        F.posexplode_outer("_p").alias("_pos", "producto"),
    ).select(
        "url",
        "tipo_documento",
        F.col("producto.*"),
    ).filter(F.col("linea_numero").isNotNull())


def with_salt_bucket(df: DataFrame, n_buckets: int = 256, url_col: str = "url") -> DataFrame:
    """Write-side bucket column: xxhash64(url) mod n_buckets.

    Emulates Iceberg ``bucket(N, url)`` partitioning; hashing the full url
    (not the host) breaks host-level skew at the storage layer — a hot host's
    pages spread uniformly over all buckets.
    """
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")
    )


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Accumulator-style extraction metrics as one aggregate row per lang:
    doc counts, field hit-rates, mean confidence. Single shuffle (groupBy)."""
    return extracted.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(F.when(F.col("proveedor_cif").isNotNull(), 1).otherwise(0)).alias("cif_hits"),
        F.sum(F.when(F.col("numero_factura") != "SIN_NUMERO", 1).otherwise(0)).alias("numero_hits"),
        F.sum(F.when(F.col("fecha_factura").isNotNull(), 1).otherwise(0)).alias("fecha_hits"),
        F.sum(F.when(F.col("total_factura") > 0, 1).otherwise(0)).alias("total_hits"),
        F.avg("confianza_global").alias("avg_confianza"),
        F.sum(F.when(F.col("tipo_documento") == "albaran", 1).otherwise(0)).alias("albaranes"),
    )
