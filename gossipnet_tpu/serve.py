"""``python -m gossipnet_tpu.serve`` — the serving CLI entry point.

Implementation and full docs live in :mod:`gossipnet_tpu.serving`
(mirrors how ``gossipnet_tpu.train`` / ``.evaluate`` expose their CLIs).
"""
from gossipnet_tpu.serving import main

if __name__ == "__main__":
    main()
