#!/usr/bin/env python
"""Prime the persistent XLA compile cache.

Run once per machine (or after a jax upgrade): executes the smoke test
tier, whose programs cover the tracker, scale-opt, windowed-BA, loop and
tiny-e2e pipeline shapes. Subsequent ``pytest -m smoke`` runs finish in
well under 2 minutes; the full suite also starts warm for every shared
shape. The cache lives in /tmp/dsslam_jax_cache_cpu (tests/conftest.py).
"""

import subprocess
import sys

sys.exit(subprocess.call(
    [sys.executable, "-m", "pytest", "tests/", "-m", "smoke", "-q"],
    cwd=__file__.rsplit("/", 2)[0],
))
