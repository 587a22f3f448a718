"""Processing-queue semantics (``cola_procesamiento``, Database_tables:375-415).

The reference drives extraction through a Postgres priority queue: rows
carry ``prioridad`` (1=facturas ... 5=otros, lower = more urgent),
``estado`` (pendiente/procesando/completado/error/...), and retry
bookkeeping (``intentos``/``max_intentos``, default 3). Worker pulls take
the highest-priority oldest pending rows; a failed attempt bumps
``intentos`` and re-queues until ``max_intentos``, then parks the row in
``estado='error'`` (the ``cola_intentos_validos`` CHECK caps intentos at
max_intentos).

Here the same semantics are two declarative batch operators:

- ``cola_next_batch`` — the worker pull: eligibility filter + top-n by
  (prioridad, fecha_programada). Plans as TakeOrderedAndProject — the
  per-partition top-n means the shuffle carries at most n rows per
  partition at any queue size.
- ``cola_apply_results`` — the outcome fold: one equi-join on
  documento_id, pure ``when`` algebra for the retry state machine.
  Idempotent (same results -> same end state), unlike the reference's
  read-modify-write UPDATE loop.

No code copied; semantics derived from the DDL constraints cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cola_next_batch", "cola_apply_results"]


def cola_next_batch(queue: DataFrame, n: int) -> DataFrame:
    """Select the next ``n`` work items: pending rows with retry budget
    left, highest priority first (1 beats 5), oldest schedule first,
    documento_id as the deterministic final tiebreak."""
    return (
        queue.filter(
            (F.col("estado") == "pendiente")
            & (F.col("intentos") < F.col("max_intentos"))
        )
        .orderBy("prioridad", "fecha_programada", "documento_id")
        .limit(n)
    )


def cola_apply_results(batch: DataFrame, results: DataFrame) -> DataFrame:
    """Fold processing outcomes into the batch rows.

    ``results``: (documento_id, exito boolean, error string|null).
    Success -> estado 'completado'. Failure -> intentos+1; re-queued as
    'pendiente' while under max_intentos, else parked as 'error'
    (terminal). Rows without a result stay untouched (worker crash:
    re-delivered next pull). ultimo_error keeps the latest message, like
    the reference's UPDATE."""
    r = results.select(
        "documento_id",
        F.col("exito").alias("_exito"),
        F.col("error").alias("_error"),
    )
    out = batch.join(r, "documento_id", "left")
    new_intentos = F.when(
        F.col("_exito") == False, F.col("intentos") + 1  # noqa: E712
    ).otherwise(F.col("intentos"))
    new_estado = (
        F.when(F.col("_exito") == True, F.lit("completado"))  # noqa: E712
        .when(
            (F.col("_exito") == False)  # noqa: E712
            & (new_intentos >= F.col("max_intentos")),
            F.lit("error"),
        )
        .when(F.col("_exito") == False, F.lit("pendiente"))  # noqa: E712
        .otherwise(F.col("estado"))
    )
    new_error = F.when(
        F.col("_exito") == False, F.col("_error")  # noqa: E712
    ).otherwise(F.col("ultimo_error"))
    return out.select(
        *[c for c in batch.columns if c not in ("estado", "intentos", "ultimo_error")],
        new_estado.alias("estado"),
        new_intentos.alias("intentos"),
        new_error.alias("ultimo_error"),
    )
