from effocr_tpu.core.config import (
    EncoderConfig,
    LocalizerConfig,
    PipelineConfig,
    RecognizerTrainConfig,
    LocalizerTrainConfig,
)
from effocr_tpu.core.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from effocr_tpu.core.batching import pad_to_multiple, pad_axis_to, make_batches
