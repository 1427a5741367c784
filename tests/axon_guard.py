"""Early pytest plugin: isolate tests from the axon TPU-tunnel plugin.

The session environment loads an axon PJRT plugin through sitecustomize
(PYTHONPATH) that intermittently stalls XLA *CPU* compiles by minutes —
unusable for a CPU-backed test suite.  The plugin registers itself
before any conftest can run, so the only reliable isolation is to
re-exec pytest with a scrubbed environment.

Loaded via ``addopts = -p tests.axon_guard`` in pytest.ini: ``-p``
plugins are imported before pytest's capture plugin takes over the
stdio file descriptors, so the re-exec'd process keeps the real
terminal/pipe.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_GRAMPLE_TEST_REEXEC"):
    env = dict(os.environ)
    for k in list(env):
        if "AXON" in k or k.startswith("TPU_") or k == "PYTHONPATH":
            env.pop(k)
    env["_GRAMPLE_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
