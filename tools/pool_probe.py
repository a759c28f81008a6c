"""Isolate maxpool backward cost: SelectAndScatter vs the custom VJP.

Usage: python tools/pool_probe.py
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.models.vgg import _maxpool2, _maxpool2_raw

V, H, W, C = 4, 784, 1044, 64
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{dt:9.2f} ms  {name}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.bfloat16)

    sas_g = jax.jit(jax.grad(
        lambda x: jnp.sum(_maxpool2_raw(x).astype(jnp.float32))))
    cus_g = jax.jit(jax.grad(
        lambda x: jnp.sum(_maxpool2(x).astype(jnp.float32))))
    sas_f = jax.jit(_maxpool2_raw)
    timed("pool fwd (reduce_window)", sas_f, x)
    timed("pool f+b SelectAndScatter", sas_g, x)
    timed("pool f+b custom VJP", cus_g, x)


if __name__ == "__main__":
    main()
