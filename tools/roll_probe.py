"""Microbenchmark pltpu.roll (tpu.dynamic_rotate) on window-sized arrays:
is the v4 per-run roll cheap or does it dominate seam-scene runs?

Usage: python tools/roll_probe.py
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITERS = 2000


def make_kernel(mode, h, w):
    def kernel(s_ref, x_ref, o_ref):
        i = pl.program_id(0)
        # iteration-dependent input so nothing hoists out of the grid loop
        v = x_ref[...] + i.astype(jnp.float32)
        if mode == "roll_both":
            v = pltpu.roll(v, s_ref[i], axis=1)
            v = pltpu.roll(v, s_ref[i] + 1, axis=2)
        elif mode == "roll_y":
            v = pltpu.roll(v, s_ref[i], axis=1)
        elif mode == "roll_x":
            v = pltpu.roll(v, s_ref[i], axis=2)
        # 'copy' mode: no roll
        o_ref[...] = o_ref[...] * 0.5 + v

    return kernel


def bench(mode, h, w):
    shifts = jnp.asarray(np.random.default_rng(0).integers(0, 7, N_ITERS),
                         jnp.int32)
    x = jnp.asarray(np.random.default_rng(1).random((3, h, w)), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N_ITERS,),
        in_specs=[pl.BlockSpec((3, h, w), lambda i, s: (0, 0, 0))],
        out_specs=pl.BlockSpec((3, h, w), lambda i, s: (0, 0, 0)),
        scratch_shapes=[],
    )
    fn = pl.pallas_call(
        make_kernel(mode, h, w), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
    )
    f = jax.jit(lambda s, x: fn(s, x))
    out = f(shifts, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(shifts, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_ITERS * 1e6
    print(f"{mode:10s} [3,{h},{w}]: {dt:7.2f} us/iter", flush=True)


def main():
    for (h, w) in [(272, 384), (64, 256), (32, 128)]:
        for mode in ("copy", "roll_y", "roll_x", "roll_both"):
            bench(mode, h, w)


if __name__ == "__main__":
    main()
