from gossipnet_tpu.ops.pallas.pairwise import pallas_pair_pool  # noqa: F401
