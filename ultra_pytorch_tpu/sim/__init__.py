from ultra_pytorch_tpu.sim.click_models import (  # noqa: F401
    ClickModelParams,
    make_click_model,
    load_model_from_json,
    model_to_json,
    sample_clicks,
    propensity_weights,
)
from ultra_pytorch_tpu.sim.sampling import (  # noqa: F401
    plackett_luce_sample,
    deterministic_rank,
)
from ultra_pytorch_tpu.sim.interleave import (  # noqa: F401
    team_draft_interleave,
    infer_winners,
)
from ultra_pytorch_tpu.sim.propensity import (  # noqa: F401
    BasicPropensityEstimator,
    RandomizedPropensityEstimator,
    OraclePropensityEstimator,
)
