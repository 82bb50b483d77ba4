from ultra_pytorch_tpu.input_layer.feeds import (  # noqa: F401
    BaseInputFeed,
    DirectLabelFeed,
    ClickSimulationFeed,
    DeterministicOnlineSimulationFeed,
    StochasticOnlineSimulationFeed,
)
