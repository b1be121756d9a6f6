from ed_housing_data_pipeline_spark.functions.numeric import (  # noqa: F401
    coerce_double,
    horizontal_sum,
    null_if_zero,
    safe_div,
)
from ed_housing_data_pipeline_spark.functions.text import (  # noqa: F401
    normalize_join_key,
    normalize_text,
    token_count,
    word_shingles,
)
from ed_housing_data_pipeline_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
