from ultra_pytorch_tpu.data.dataset import (  # noqa: F401
    RankingDataset,
    DeviceDataset,
    read_data,
    merge_summary,
)
from ultra_pytorch_tpu.data.trec import output_ranklist  # noqa: F401
