from ultra_pytorch_tpu.metrics.ranking import (  # noqa: F401
    RankingMetricKey,
    PADDING_SCORE,
    make_ranking_metric_fn,
    evaluate,
    ndcg,
)
