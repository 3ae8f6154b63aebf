from pfutil_spark.operators.hll_agg import (  # noqa: F401
    pf_count_col,
    pf_count_distinct,
    pf_dump_col,
    pf_merge,
    pf_partial,
    pf_restore_col,
    pf_sketch,
)
