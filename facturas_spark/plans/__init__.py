"""Plan-audit surface: read-and-assert helpers over executed physical
plans (pushdown, pruning, join kinds, Python-eval and single-partition
detection). See plans/audit.py; tests/test_plans.py consumes these."""
from facturas_spark.plans.audit import (  # noqa: F401
    exchange_count,
    executed_plan,
    has_cartesian,
    has_python_eval,
    join_kinds,
    pushed_filters,
    read_schemas,
    single_partition_exchanges,
)
