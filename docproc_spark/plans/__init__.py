"""Plan-inspection helpers (pushdown/broadcast/shuffle assertions)."""

from docproc_spark.plans.explain import (  # noqa: F401
    count_nodes,
    executed_plan,
    plan_summary,
)
