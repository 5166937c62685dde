from gossipnet_tpu.parallel.sharding import (  # noqa: F401
    DET_AXIS,
    DATA_AXIS,
    make_mesh,
    make_sharded_train_step,
    make_sharded_inference,
)
from gossipnet_tpu.parallel.spmd import gossipnet_sharded_forward  # noqa: F401
