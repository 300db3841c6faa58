from .pricing import (  # noqa: F401
    region_trailing_avg,
    city_alpha,
    score_requests,
    validate_requests,
)
from .forecast import ols_forecast, ols_forecast_pandas  # noqa: F401
from .ingest import bootstrap_annual_pipeline, daily_downsample  # noqa: F401
