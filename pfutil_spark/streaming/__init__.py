from pfutil_spark.streaming.hll_stream import (  # noqa: F401
    StreamingHllState,
    attach_hll_foreach_batch,
    streaming_distinct_with_state,
    streaming_session_counts,
    streaming_windowed_distinct,
)
from pfutil_spark.streaming.dedup_stream import (  # noqa: F401
    StreamingSignatureStore,
    attach_dedup_foreach_batch,
)
from pfutil_spark.streaming.cdc_stream import (  # noqa: F401
    StreamingUpsertStore,
    attach_upsert_foreach_batch,
)
from pfutil_spark.streaming.sketch_stream import (  # noqa: F401
    streaming_drift_with_state,
    streaming_quantiles_with_state,
    streaming_topk_with_state,
)
