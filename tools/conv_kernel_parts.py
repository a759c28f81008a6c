"""Locate the wall inside the v2 conv kernel: time kernel variants with
pieces disabled (DMA only / +copies / +matmuls / matmul-only) on the packed
conv1_2 shape. Correctness is irrelevant here — only the schedule is timed.

Usage: python tools/conv_kernel_parts.py        (writes results/conv_parts.json)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stylemesh_tpu.ops.conv_pallas import _pick_tile

REPS = 20
# packed conv1_2 shape: [4, 784, 523, 128] -> out 128ch
B, H, W, CIN, COUT = 4, 784, 523, 128, 128


def make_kernel(th, tw, cin, cout, nh, nw, do_dma, do_copy, do_mm):
    def kernel(x_hbm, w_ref, out_ref, in_buf, col_buf, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        linear = (b * nh + i) * nw + j
        n_total = pl.num_programs(0) * nh * nw

        def start_load(lin, slot):
            bb = lin // (nh * nw)
            ii = (lin // nw) % nh
            jj = lin % nw
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * th, th + 2),
                         pl.ds(jj * tw, tw + 16), :],
                in_buf.at[slot], sems.at[slot])

        slot = linear % 2
        if do_dma:
            @pl.when(linear == 0)
            def _():
                start_load(0, 0).start()

            @pl.when(linear + 1 < n_total)
            def _():
                start_load(linear + 1, (linear + 1) % 2).start()

            start_load(linear, slot).wait()

        if do_copy:
            for dx in range(3):
                col_buf[:, :, dx * cin:(dx + 1) * cin] = (
                    in_buf[slot, :, 7 + dx:7 + dx + tw, :])

        if do_mm:
            acc = None
            for dy in range(3):
                part = jax.lax.dot_general(
                    col_buf[dy:dy + th, :, :].reshape(th * tw, 3 * cin),
                    w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            out_ref[0] = acc.reshape(th, tw, cout).astype(jnp.bfloat16)
        else:
            out_ref[0] = in_buf[slot, 0:th, 0:tw, 0:cout] * 2.0

    return kernel


def run_variant(name, do_dma, do_copy, do_mm, xp, w2):
    th, tw, nh, nw = _pick_tile(CIN, H, W)
    kernel = make_kernel(th, tw, CIN, COUT, nh, nw, do_dma, do_copy, do_mm)
    call = pl.pallas_call(
        kernel,
        grid=(B, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * CIN, COUT), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw, COUT), lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, th * nh, tw * nw, COUT),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 16, CIN), jnp.bfloat16),
            pltpu.VMEM((th + 2, tw, 3 * CIN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024, has_side_effects=True),
    )
    f = jax.jit(lambda x, w: call(x, w))
    out = f(xp, w2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(xp, w2)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"# {name}: {dt * 1e3:.3f} ms", flush=True)
    return dt * 1e3


def main():
    th, tw, nh, nw = _pick_tile(CIN, H, W)
    print(f"# tile {th}x{tw} grid {B}x{nh}x{nw} = {B * nh * nw}")
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.random((B, th * nh + 2, tw * nw + 16, CIN),
                                np.float32), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (9 * CIN, COUT)), jnp.bfloat16)
    res = {"tile": [th, tw], "grid": [B, nh, nw]}
    res["dma_only"] = run_variant("dma_only", True, False, False, xp, w2)
    res["dma_copy"] = run_variant("dma_copy", True, True, False, xp, w2)
    res["copy_mm"] = run_variant("copy_mm(no dma)", False, True, True, xp, w2)
    res["mm_only"] = run_variant("mm_only", False, False, True, xp, w2)
    res["full"] = run_variant("full", True, True, True, xp, w2)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "conv_parts.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
