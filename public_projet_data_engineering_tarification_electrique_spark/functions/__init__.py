from .pricing import (  # noqa: F401
    clamp,
    household_consumption_kwh,
    m_factor,
    annual_price,
    monthly_price,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
from .text import (  # noqa: F401
    token_count,
    punct_ratio,
    stopword_ratio,
    fingerprint_md5,
    char_ngrams,
)
