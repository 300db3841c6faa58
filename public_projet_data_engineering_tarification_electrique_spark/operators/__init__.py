from .pricing import (  # noqa: F401
    region_trailing_avg,
    city_alpha,
    score_requests,
    validate_requests,
)
from .forecast import ols_forecast, ols_forecast_pandas  # noqa: F401
from .ingest import bootstrap_annual_pipeline, daily_downsample  # noqa: F401
from .dedup import (  # noqa: F401
    containment_pairs,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_neardup,
)
