"""Arrow-batched pandas UDFs wrapping the deterministic parser core.

These are the only Python hot-path entry points in the engine; everything
else is built-in Spark SQL expressions. Each UDF receives Arrow record
batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` rows at a time),
loops in-process over precompiled regexes, and returns a whole batch — no
per-row Spark round-trips (per-row Python UDFs are banned by the north rule).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pyspark.sql.types import ArrayType, BooleanType

from facturas_spark.extraction.boilerplate import extract_main_text
from facturas_spark.extraction.products import extract_products
from facturas_spark.extraction.textparse import classify_document, extract_fields

__all__ = [
    "EXTRACTED_SCHEMA",
    "PRODUCT_SCHEMA",
    "FULL_SCHEMA",
    "extract_fields_udf",
    "main_text_udf",
    "classify_udf",
    "extract_products_udf",
    "extract_doc_udf",
]

EXTRACTED_SCHEMA = StructType(
    [
        StructField("proveedor_nombre", StringType()),
        StructField("proveedor_cif", StringType()),
        StructField("numero_factura", StringType()),
        StructField("fecha_factura", DateType()),
        StructField("total_factura", DoubleType()),
        StructField("base_imponible", DoubleType()),
        StructField("cuota_iva", DoubleType()),
        StructField("tipo_iva", IntegerType()),
        StructField("confianza_global", DoubleType()),
        StructField("confianza_proveedor", DoubleType()),
        StructField("confianza_datos_fiscales", DoubleType()),
        StructField("confianza_importes", DoubleType()),
    ]
)

CLASSIFY_SCHEMA = StructType(
    [
        StructField("tipo_documento", StringType()),
        StructField("confianza_clasificacion", DoubleType()),
        StructField("razonamiento", StringType()),
    ]
)


@pandas_udf(EXTRACTED_SCHEMA)
def extract_fields_udf(text: pd.Series) -> pd.DataFrame:
    """F1-F12 deterministic field extraction, one struct per document."""
    rows = []
    for t in text:
        f = extract_fields(t if isinstance(t, str) else None)
        rows.append(
            (
                f.proveedor_nombre,
                f.proveedor_cif,
                f.numero_factura,
                f.fecha_factura,
                f.total_factura,
                f.base_imponible,
                f.cuota_iva,
                f.tipo_iva,
                f.confianza_global,
                f.confianza_proveedor,
                f.confianza_datos_fiscales,
                f.confianza_importes,
            )
        )
    return pd.DataFrame(
        rows, columns=[fld.name for fld in EXTRACTED_SCHEMA.fields]
    )


@pandas_udf(StringType())
def main_text_udf(html: pd.Series, text: pd.Series) -> pd.Series:
    """Main-content text per page: pre-extracted ``text`` wins when present;
    otherwise the boilerplate strip runs on the ``html`` payload."""
    out = []
    for h, t in zip(html, text):
        if isinstance(t, str) and t:
            out.append(t)
        else:
            out.append(extract_main_text(h))
    return pd.Series(out, dtype="object")


@pandas_udf(CLASSIFY_SCHEMA)
def classify_udf(text: pd.Series) -> pd.DataFrame:
    """C1 document classifier (factura/albaran + confidence + reason tag)."""
    rows = [classify_document(t if isinstance(t, str) else None) for t in text]
    return pd.DataFrame(
        rows, columns=["tipo_documento", "confianza_clasificacion", "razonamiento"]
    )


PRODUCT_SCHEMA = StructType(
    [
        StructField("linea_numero", IntegerType()),
        StructField("descripcion_original", StringType()),
        StructField("descripcion_normalizada", StringType()),
        StructField("cantidad", DoubleType()),
        StructField("unidad_medida", StringType()),
        StructField("codigo_producto", StringType()),
        StructField("precio_unitario_sin_iva", DoubleType()),
        StructField("precio_unitario_con_iva", DoubleType()),
        StructField("precio_total_linea_sin_iva", DoubleType()),
        StructField("precio_total_linea_con_iva", DoubleType()),
        StructField("tipo_iva", IntegerType()),
        StructField("confianza_linea", DoubleType()),
        StructField("formato_comercial", StringType()),
        StructField("peso_neto_kg", DoubleType()),
        StructField("volumen_l", DoubleType()),
        StructField("formato_valido", BooleanType()),
        StructField("precio_por_kg", DoubleType()),
        StructField("precio_por_litro", DoubleType()),
        StructField("categoria", StringType()),
    ]
)

_PRODUCT_COLS = [f.name for f in PRODUCT_SCHEMA.fields]


# The fused per-document kernel: ONE Python eval node for the whole doc
# pipeline. Chained dependent pandas UDFs each become a separate
# PythonEvalExec with its own worker per task — at 32 tasks x 4 chained UDFs
# that's 128 concurrent Python workers and 4 Arrow round-trips per row.
# Fusing keeps it at one worker per task and one Arrow transfer.
FULL_SCHEMA = StructType(
    [
        StructField("extracted_text", StringType()),
        StructField("tipo_documento", StringType()),
        StructField("confianza_clasificacion", DoubleType()),
        *EXTRACTED_SCHEMA.fields,
        StructField("productos", ArrayType(PRODUCT_SCHEMA)),
    ]
)

_PRODUCT_COLS_FUSED = [f.name for f in PRODUCT_SCHEMA.fields]


def extract_batch(html, text) -> pd.DataFrame:
    """The fused per-batch kernel (shared by the pandas UDF and the
    accumulator-instrumented mapInPandas path): boilerplate strip ->
    classify -> field extraction -> line-item extraction."""
    from facturas_spark.extraction.products import extract_products

    rows = []
    for h, t in zip(html, text):
        doc_text = t if isinstance(t, str) and t else extract_main_text(h)
        tipo, conf, _ = classify_document(doc_text)
        f = extract_fields(doc_text)
        prods = extract_products(doc_text, f.tipo_iva)
        rows.append(
            (
                doc_text,
                tipo,
                conf,
                f.proveedor_nombre,
                f.proveedor_cif,
                f.numero_factura,
                f.fecha_factura,
                f.total_factura,
                f.base_imponible,
                f.cuota_iva,
                f.tipo_iva,
                f.confianza_global,
                f.confianza_proveedor,
                f.confianza_datos_fiscales,
                f.confianza_importes,
                [tuple(map(p.get, _PRODUCT_COLS_FUSED)) for p in prods],
            )
        )
    return pd.DataFrame(rows, columns=[fld.name for fld in FULL_SCHEMA.fields])


@pandas_udf(FULL_SCHEMA)
def extract_doc_udf(html: pd.Series, text: pd.Series) -> pd.DataFrame:
    """Fused doc pipeline: one Python pass per Arrow batch."""
    return extract_batch(html, text)


# Header-only variant: the 10^12-doc header pipeline (extract_pages) never
# reads ``productos``, but the full UDF still computed the line items (~43%
# of kernel time) and shipped the nested array<struct> back through Arrow —
# whose ColumnVector->UnsafeRow copy dominated the JVM side of the job.
# Computing only what the job consumes cut the sf0.1 bench wall ~2x.
HEADER_SCHEMA = StructType(
    [
        StructField("extracted_text", StringType()),
        StructField("tipo_documento", StringType()),
        StructField("confianza_clasificacion", DoubleType()),
        *EXTRACTED_SCHEMA.fields,
    ]
)


def extract_batch_header(html, text) -> pd.DataFrame:
    """Fused header kernel: boilerplate strip -> classify -> fields.
    Identical to :func:`extract_batch` minus line-item extraction."""
    rows = []
    for h, t in zip(html, text):
        doc_text = t if isinstance(t, str) and t else extract_main_text(h)
        tipo, conf, _ = classify_document(doc_text)
        f = extract_fields(doc_text)
        rows.append(
            (
                doc_text,
                tipo,
                conf,
                f.proveedor_nombre,
                f.proveedor_cif,
                f.numero_factura,
                f.fecha_factura,
                f.total_factura,
                f.base_imponible,
                f.cuota_iva,
                f.tipo_iva,
                f.confianza_global,
                f.confianza_proveedor,
                f.confianza_datos_fiscales,
                f.confianza_importes,
            )
        )
    return pd.DataFrame(rows, columns=[fld.name for fld in HEADER_SCHEMA.fields])


@pandas_udf(HEADER_SCHEMA)
def extract_header_udf(html: pd.Series, text: pd.Series) -> pd.DataFrame:
    """Fused header pipeline: one Python pass per Arrow batch, no
    line-item computation or transfer."""
    return extract_batch_header(html, text)


@pandas_udf(ArrayType(PRODUCT_SCHEMA))
def extract_products_udf(text: pd.Series, tipo_iva: pd.Series) -> pd.Series:
    """P3-P15 line-item extraction: one array<struct> per document, exploded
    downstream with posexplode — the per-doc sequential pipeline runs in one
    Python pass, no shuffle."""
    out = []
    for t, iva in zip(text, tipo_iva):
        prods = extract_products(
            t if isinstance(t, str) else None,
            int(iva) if iva is not None and not pd.isna(iva) else 21,
        )
        out.append([tuple(map(p.get, _PRODUCT_COLS)) for p in prods])
    return pd.Series(out, dtype="object")
