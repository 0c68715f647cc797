from cdc_postgresql_clickhouse_spark.operators.cdc_transform import changes_to_state_updates
from cdc_postgresql_clickhouse_spark.operators.state import (
    apply_changes,
    consistency_check,
    current_state,
    snapshot_load,
)

__all__ = [
    "changes_to_state_updates",
    "apply_changes",
    "consistency_check",
    "current_state",
    "snapshot_load",
]
