"""Compatibility shim: the serving CLI moved into the package.

Run ``python -m gossipnet_tpu.serve`` (see gossipnet_tpu/serving.py for
the full docs); this script keeps the historical invocation working.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from gossipnet_tpu.serving import (  # noqa: F401
    TcpServer, main, serve_file, serve_stream,
)
from gossipnet_tpu.serving import _build, _training_cat_ids  # noqa: F401

if __name__ == "__main__":
    main()
