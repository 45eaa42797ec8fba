from .search import (  # noqa: F401
    PassResult,
    SearchResult,
    find_target_quality,
    interpolate_quantizer,
    predict_q_from_score,
)
