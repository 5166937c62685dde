from gossipnet_tpu.data.roidb import ImageRecord, Roidb  # noqa: F401
from gossipnet_tpu.data.bucketing import (  # noqa: F401
    Batch,
    bucket_for,
    make_batch,
    BatchIterator,
)
