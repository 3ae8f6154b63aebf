from pfutil_spark.functions.text import (  # noqa: F401
    lang_id_col,
    quality_features,
    token_count_col,
)
from pfutil_spark.functions.layout import (  # noqa: F401
    morton_key_col,
    morton_sql_expr,
)
from pfutil_spark.functions.unicode import (  # noqa: F401
    clean_whitespace_col,
    normalize_col,
    unicode_stats,
)
