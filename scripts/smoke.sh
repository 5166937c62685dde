#!/bin/sh
# Fast smoke tier — the pre-commit gate (VERDICT r3 next-round #2).
#
# Run before EVERY commit that touches gossipnet_tpu/:
#     sh scripts/smoke.sh            # ~2-3 min on this host's CPU
# Run the FULL suite before the end-of-round snapshot:
#     python -m pytest tests/ -q    # ~10+ min
#
# The r3 snapshot shipped a NameError on the whole public serving
# surface because nothing cheap stood between "edit api.py" and
# "commit". This tier covers exactly that blast radius: the public
# Rescorer API, the package surface, and the serve CLI/TcpServer.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/test_api.py tests/test_package_api.py \
    tests/test_serve.py -q "$@"
