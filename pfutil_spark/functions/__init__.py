from pfutil_spark.functions.text import (  # noqa: F401
    lang_id_col,
    quality_features,
    token_count_col,
)
