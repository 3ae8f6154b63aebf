from pfutil_spark.operators._cache import (  # noqa: F401
    CacheScope,
    release_cached,
)
from pfutil_spark.operators.hll_agg import (  # noqa: F401
    pf_count_col,
    pf_count_distinct,
    pf_dump_col,
    pf_merge,
    pf_partial,
    pf_restore_col,
    pf_sketch,
)
from pfutil_spark.operators.multi import (  # noqa: F401
    pf_count_distinct_multi,
    pf_partial_multi,
)
from pfutil_spark.operators.rollup import (  # noqa: F401
    approx_top_k,
    approx_top_k_sketch,
    pf_cube,
    pf_rollup,
    pf_time_rollup,
)
from pfutil_spark.operators.curation import (  # noqa: F401
    curate_corpus,
)
from pfutil_spark.operators.funnel import (  # noqa: F401
    event_transitions,
    funnel_counts,
    session_paths,
)
from pfutil_spark.operators.audit import (  # noqa: F401
    join_skew_report,
    referential_audit,
    snapshot_diff,
    snapshot_diff_summary,
)
from pfutil_spark.operators.retention import (  # noqa: F401
    activity_days,
    cohort_retention,
    retention_estimates,
    retention_sketches,
    retention_within_k,
    return_gaps,
    rolling_active_users,
)
from pfutil_spark.operators.stats import (  # noqa: F401
    daily_count_anomalies,
    degree_distribution,
    fixed_width_histogram,
    triangle_count,
)
from pfutil_spark.operators.search import (  # noqa: F401
    build_postings,
    keyword_search_topk,
    word_pair_lift,
)
from pfutil_spark.operators.rangejoin import (  # noqa: F401
    interval_join,
)
from pfutil_spark.operators.skew import (  # noqa: F401
    salted_join,
)
from pfutil_spark.operators.graph import (  # noqa: F401
    bfs_distances,
    nearest_seed,
    pagerank,
)
from pfutil_spark.operators.cdc import (  # noqa: F401
    apply_upserts,
)
from pfutil_spark.operators.spans import (  # noqa: F401
    repeated_spans,
    span_coverage,
)
from pfutil_spark.operators.drift import (  # noqa: F401
    cardinality_drift,
    drift_against_reference,
    drift_matrix,
    table_drift,
    table_sketches,
    topk_drift,
)
