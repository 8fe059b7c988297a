#!/usr/bin/env python
"""Prime the persistent XLA compile cache.

Run once per machine (or after a jax upgrade / sandbox host migration):
executes each test file in its OWN subprocess with cache WRITES enabled
(DSSLAM_CACHE_WRITE=1). Two reasons for the per-file subprocesses:

1. XLA:CPU's executable.serialize() intermittently hard-aborts (SIGABRT)
   late in a long-running process on this platform; test runs therefore
   never write the cache (tests/conftest.py), and priming contains any
   abort to one retryable subprocess.
2. A fresh process serializes the same executables without issue
   (reproduced r2), so per-file priming converges.

Subsequent ``pytest -m smoke`` runs finish warm in well under 2 minutes;
the full suite starts warm for every shared shape. The cache lives in
/tmp/dsslam_jax_cache_cpu_<hostkey> (tests/conftest.py)."""

import glob
import os
import subprocess
import sys

root = __file__.rsplit("/", 2)[0]
env = dict(os.environ, DSSLAM_CACHE_WRITE="1")
failures = []
for tf in sorted(glob.glob(os.path.join(root, "tests", "test_*.py"))):
    name = os.path.basename(tf)
    for attempt in (1, 2):
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", tf, "-q", "-x"],
            cwd=root, env=env)
        if rc == 0:
            break
        print(f"[prime] {name} attempt {attempt} rc={rc}", flush=True)
    else:
        failures.append(name)
    print(f"[prime] {name} done", flush=True)
if failures:
    print("[prime] files that never passed:", failures)
sys.exit(1 if failures else 0)
