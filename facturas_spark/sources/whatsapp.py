"""WhatsApp ingestion routing (webhook-whatsapp/index.ts:55-145).

The reference's webhook identifies the tenant for each incoming message by
trying FOUR phone-number variations in order against the
``whatsapp_vinculaciones`` table (activo rows only) — clean digits,
'+'-prefixed, country-code-stripped, '+34'-normalized — taking the first
hit; unlinked numbers are rejected, and a media file already registered
for the restaurant is skipped (idempotence). Here the same rules run as
one batch plan: posexplode the ordered variation array, inner-join the
active vinculaciones dim (broadcast — it is a per-tenant phone book),
keep the lowest variation index per message, then flag duplicate media
per (restaurante, media_id) with a first-wins window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["phone_variations", "route_whatsapp"]


def phone_variations(tel: Column) -> Column:
    """The reference's exact 4-variation array (index.ts:71-78), in order:
    [limpio, '+'+limpio, sin-34, '+34'+sin-34] where limpio strips
    spaces/dashes/parens and sin-34 drops a leading '34' if present.
    Duplicates are NOT removed here — first-match-wins ordering below
    reproduces the JS Set's keep-first semantics."""
    limpio = F.regexp_replace(tel, r"[\s\-()]", "")
    sin34 = F.when(
        limpio.startswith("34"), limpio.substr(F.lit(3), F.length(limpio))
    ).otherwise(limpio)
    return F.array(
        limpio,
        F.concat(F.lit("+"), limpio),
        sin34,
        F.concat(F.lit("+34"), sin34),
    )


def route_whatsapp(messages: DataFrame, vinculaciones: DataFrame) -> DataFrame:
    """Route incoming messages (msg_id, telefono, media_id) to tenants.

    Output adds ``restaurante_id`` and ``estado``: 'aceptado' |
    'duplicado' (media already seen for that restaurante — earliest msg_id
    wins, the webhook's documentos-lookup idempotence) | 'no_vinculado'
    (no active vinculación matches any variation)."""
    exploded = messages.select(
        "msg_id",
        F.posexplode(phone_variations(F.col("telefono"))).alias("_idx", "_v"),
    )
    vinc = vinculaciones.filter(F.col("activo")).select(
        F.col("telefono").alias("_stored"), "restaurante_id"
    )
    best = (
        exploded.join(F.broadcast(vinc), exploded._v == vinc._stored)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("msg_id").orderBy("_idx")),
        )
        .filter(F.col("_rn") == 1)
        .select("msg_id", "restaurante_id")
    )
    routed = messages.join(best, "msg_id", "left")
    dup_rn = F.row_number().over(
        Window.partitionBy("restaurante_id", "media_id").orderBy("msg_id")
    )
    return (
        routed.withColumn(
            "_dup", F.when(F.col("restaurante_id").isNotNull(), dup_rn)
        )
        .select(
            "msg_id",
            "telefono",
            "media_id",
            "restaurante_id",
            F.when(F.col("restaurante_id").isNull(), F.lit("no_vinculado"))
            .when(F.col("_dup") > 1, F.lit("duplicado"))
            .otherwise(F.lit("aceptado"))
            .alias("estado"),
        )
    )
