"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Numerical-parity tests compare against torch (CPU); multi-chip sharding tests
use the 8 virtual host devices — the TPU-era analogue of testing multi-node
logic without a real cluster.

NOTE: this environment's sitecustomize pre-imports jax with the hardware
platform pinned via env, so env vars set here are too late — the platform
must be forced through jax.config (legal until a backend initializes).
"""

import atexit
import os
import shutil
import tempfile

os.environ.setdefault("JAX_ENABLE_X64", "0")

# Isolate the splat-plan disk cache from the user-global default: test
# scenes use seeded RNGs (identical uv bytes run-over-run), so a shared
# cache could mask planner changes with stale plans — and tests must not
# pollute ~/.cache. One fresh dir per test session still exercises the
# cache code path; removed at interpreter exit so sessions don't litter
# /tmp with plan blobs.
_plan_cache_dir = tempfile.mkdtemp(prefix="stylemesh_plan_cache_test_")
os.environ["STYLEMESH_PLAN_CACHE_DIR"] = _plan_cache_dir
atexit.register(shutil.rmtree, _plan_cache_dir, True)

# Persistent compilation cache: the loss/pipeline graphs are large and
# compile slowly; reruns hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    # a backend already initialized (e.g. conftest re-imported) — verify
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; a non-CPU backend initialized first")
