#!/bin/bash
# Test gates.
#   scripts/test.sh            fast pre-commit gate (~70 s on a 1-CPU box)
#   scripts/test.sh full       the whole suite (~18 min)
# Tests always run on an 8-device virtual CPU mesh (tests/conftest.py);
# Pallas kernels run in interpret mode there.
set -e
cd "$(dirname "$0")/.."
if [ "$1" = "full" ]; then
    exec python -m pytest tests/ -q
fi
exec python -m pytest tests/ -m "not slow" -q
