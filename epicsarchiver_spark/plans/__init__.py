from epicsarchiver_spark.plans.inspect import (  # noqa: F401
    explain_str,
    pushed_filters,
    read_schema_columns,
    scan_partition_filters,
)
