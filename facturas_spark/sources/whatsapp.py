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

__all__ = ["phone_variations", "route_whatsapp", "route_mailgun"]

MAILGUN_DOMAIN = "@facturas-restaurantes.brainstormersagency.com"


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
    (no active vinculación matches any variation).

    A variation matching MORE than one active vinculación is skipped
    entirely — the reference's ``.single()`` (index.ts:104) errors on
    duplicate phone-book rows and the loop falls through to the next
    variation; an arbitrary pick here would be nondeterministic AND
    unfaithful. Both aggregations share the msg_id key prefix, so this
    stays one exchange."""
    exploded = messages.select(
        "msg_id",
        F.posexplode(phone_variations(F.col("telefono"))).alias("_idx", "_v"),
    )
    vinc = vinculaciones.filter(F.col("activo")).select(
        F.col("telefono").alias("_stored"), "restaurante_id"
    )
    per_variation = (
        exploded.join(F.broadcast(vinc), exploded._v == vinc._stored)
        .groupBy("msg_id", "_idx")
        .agg(
            F.count("*").alias("_cnt"),
            F.min("restaurante_id").alias("restaurante_id"),
        )
    )
    best = (
        per_variation.filter(F.col("_cnt") == 1)  # .single(): ambiguous -> skip
        .groupBy("msg_id")
        .agg(F.min_by("restaurante_id", "_idx").alias("restaurante_id"))
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


def route_mailgun(emails: DataFrame, restaurantes: DataFrame) -> DataFrame:
    """Email-ingestion tenant routing (weebhook-mailgun/index.ts:180-205),
    exact gate order: recipient must CONTAIN the service domain (substring,
    not suffix — faithful); the local part splits on '.' and needs >= 2
    segments; the tenant key is the LAST segment, looked up against
    restaurantes.unique_id; then zero attachments short-circuit.

    emails: (msg_id, recipient, n_attachments); adds restaurante_id +
    estado in the reference's check order: 'destinatario_invalido' |
    'formato_invalido' | 'restaurante_no_encontrado' | 'sin_adjuntos' |
    'aceptado'."""
    prefix = F.split(F.col("recipient"), "@").getItem(0)
    parts = F.split(prefix, r"\.")
    unique_id = F.element_at(parts, -1)
    e = emails.select(
        "*",
        F.col("recipient").contains(MAILGUN_DOMAIN).alias("_dom"),
        (F.size(parts) >= 2).alias("_fmt"),
        unique_id.alias("_uid"),
    )
    r = restaurantes.select(
        F.col("unique_id").alias("_ruid"), "restaurante_id"
    )
    return (
        e.join(F.broadcast(r), e._uid == r._ruid, "left")
        .select(
            "msg_id",
            "recipient",
            "n_attachments",
            F.when(F.col("_dom") & F.col("_fmt"), F.col("restaurante_id")).alias(
                "restaurante_id"
            ),
            F.when(~F.col("_dom"), F.lit("destinatario_invalido"))
            .when(~F.col("_fmt"), F.lit("formato_invalido"))
            .when(F.col("restaurante_id").isNull(), F.lit("restaurante_no_encontrado"))
            .when(F.col("n_attachments") == 0, F.lit("sin_adjuntos"))
            .otherwise(F.lit("aceptado"))
            .alias("estado"),
        )
    )
