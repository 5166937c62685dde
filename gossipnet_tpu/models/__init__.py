from gossipnet_tpu.models.gossipnet import GossipNet  # noqa: F401
