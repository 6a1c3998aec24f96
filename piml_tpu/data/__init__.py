from piml_tpu.data.views import (  # noqa: F401
    ChanneledData,
    PointwiseData,
    TimeIndexedData,
    make_time_indexed,
    merge_pointwise,
    neighbor_config,
    to_channeled,
    to_pointwise,
    window_slice,
)
from piml_tpu.data.datasets import (  # noqa: F401
    FinetuneDataset,
    PointwiseDataset,
    VisDataset,
    augment_scenes,
    channel_batches,
    load_scenes,
)
from piml_tpu.data import processing  # noqa: F401
