"""Isolate the v2 Pallas conv kernel's in-kernel cost on real hardware.

results/conv_v2_probe.json says the kernel runs conv1_2-packed at ~10% MFU
(12.8 ms vs 2.45 ms matmul-ideal at 2x packed FLOPs) while the per-tile
arithmetic predicts ~25 us/tile against ~76 us measured. This probe A/Bs
kernel-internal formulations on the SAME shape to find the 3x:

  dma_ref    DMA in + write zeros           (pipeline + DMA floor)
  mm_ref     DMA + 3 matmuls on uninit col  (floor + MXU, no dx copies)
  v2raw      the shipping kernel            (copies + reshape-2D matmuls)
  col3d      dx copies + 3D dots, no reshape
  nocol3d    no col_buf: 9 shifted 3D dots straight off in_buf
  col9       one [th,tw,9cin] buffer + single K=9cin matmul
  acc_scr    f32 VMEM scratch accumulator (+=) instead of part1+part2+part3
  tile:AxB   v2raw at alternative tile shapes

Timing: in-graph scan chain (see tools/mfu_probe.py — single dispatches on
the tunnel backend report nonsense).

Usage: python tools/conv_variants_probe.py  (writes results/conv_variants.json)
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

from stylemesh_tpu.ops import conv_pallas as cp

B, H, W, C = 4, 784, 1045, 64   # conv1_2 at pyramid level 3
REPS, INNER = 5, 8


def timed_chain(name, make_y, x):
    def reps(x):
        def body(c, _):
            y = make_y(c)
            mix = (1.0 + 1e-12 * jnp.mean(y.astype(jnp.float32))).astype(c.dtype)
            return c * mix, ()
        c, _ = jax.lax.scan(body, x, None, length=INNER)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(reps)
    try:
        out = jax.block_until_ready(f(x))
    except Exception as e:  # noqa: BLE001 - variant may be unsupported
        print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS / INNER * 1e3
    print(f"# {name}: {dt:.3f} ms/iter", flush=True)
    return dt


def _kernel(th, tw, cin, cout, nh, nw, mode,
            x_hbm, w_ref, out_ref, in_buf, col_buf, acc_scr, sems):
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
            x_hbm.at[bb, pl.ds(ii * th, th + 2), pl.ds(jj * tw, tw + 16), :],
            in_buf.at[slot], sems.at[slot])

    @pl.when(linear == 0)
    def _():
        start_load(0, 0).start()

    @pl.when(linear + 1 < n_total)
    def _():
        start_load(linear + 1, (linear + 1) % 2).start()

    slot = linear % 2
    start_load(linear, slot).wait()

    if mode == "dma_ref":
        out_ref[0] = jnp.full((th, tw, cout), 0.5, out_ref.dtype) * in_buf[slot, 0, 0, 0]
        return

    if mode in ("v2raw", "mm_ref", "col3d", "acc_scr"):
        if mode != "mm_ref":
            for dx in range(3):
                col_buf[:, :, dx * cin:(dx + 1) * cin] = (
                    in_buf[slot, :, 7 + dx:7 + dx + tw, :])
        if mode == "col3d":
            acc = None
            for dy in range(3):
                part = jax.lax.dot_general(
                    col_buf[dy:dy + th, :, :],
                    w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)
            return
        if mode == "acc_scr":
            for dy in range(3):
                part = jax.lax.dot_general(
                    col_buf[dy:dy + th, :, :].reshape(th * tw, 3 * cin),
                    w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if dy == 0:
                    acc_scr[:, :] = part
                else:
                    acc_scr[:, :] += part
            out_ref[0] = jnp.maximum(acc_scr[:, :], 0.0).reshape(
                th, tw, cout).astype(out_ref.dtype)
            return
        acc = None
        for dy in range(3):
            part = jax.lax.dot_general(
                col_buf[dy:dy + th, :, :].reshape(th * tw, 3 * cin),
                w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out_ref[0] = jnp.maximum(acc, 0.0).reshape(
            th, tw, cout).astype(out_ref.dtype)
        return

    if mode == "nocol3d":
        acc = None
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.dot_general(
                    in_buf[slot, dy:dy + th, 7 + dx:7 + dx + tw, :],
                    w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)
        return

    if mode == "col9":
        for dy in range(3):
            for dx in range(3):
                col_buf[:, :, (dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin] = (
                    in_buf[slot, dy:dy + th, 7 + dx:7 + dx + tw, :])
        acc = jax.lax.dot_general(
            col_buf[:, :, :].reshape(th * tw, 9 * cin),
            w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] = jnp.maximum(acc, 0.0).reshape(
            th, tw, cout).astype(out_ref.dtype)
        return

    raise ValueError(mode)


def run_variant(xp_full, w2, h, wdt, cin, cout, mode, tile=None):
    th0, tw0, nh, nw = cp._pick_tile(cin, h, wdt)
    if tile is not None:
        th0, tw0 = tile
        nh, nw = -(-h // th0), -(-wdt // tw0)
    th, tw = th0, tw0

    if mode == "col9":
        col_shape = (th, tw, 9 * cin)
    else:
        col_shape = (th + 2, tw, 3 * cin)

    def call(x):
        xp = jnp.pad(x, ((0, 0), (1, th * nh - h + 1),
                         (8, tw * nw - wdt + 8), (0, 0)))
        kernel = functools.partial(_kernel, th, tw, cin, cout, nh, nw, mode)
        out = pl.pallas_call(
            kernel,
            grid=(x.shape[0], nh, nw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9 * cin, cout), lambda b, i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, tw, cout),
                                   lambda b, i, j: (b, i, j, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (x.shape[0], th * nh, tw * nw, cout), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, th + 2, tw + 16, cin), jnp.bfloat16),
                pltpu.VMEM(col_shape, jnp.bfloat16),
                pltpu.VMEM((th * tw, cout), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(xp, w2)
        return out[:, :h, :wdt, :]

    return call


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)

    # pre-packed input + kernel (what _conv3x3_v2_raw sees for the 64ch head)
    xp = cp.pack_width2(x)                      # [4, 784, 523, 128]
    wp = cp._pack_w2d_kernel_np(w)              # [3, 3, 128, 128]
    cin, cout = 128, 128
    h, wdt = xp.shape[1], xp.shape[2]
    w2 = wp.reshape(9 * cin, cout)

    res = {"shape": [B, H, W, C], "packed": list(xp.shape), "inner": INNER,
           "ideal_packed_f_ms": 2.0 * 9 * cin * cout * h * wdt * B / 197e12 * 1e3}
    print(f"# ideal packed fwd: {res['ideal_packed_f_ms']:.3f} ms")

    # parity gate for the formulations (vs shipping conv3x3_v2, f32 ref on tiny)
    ref = cp.conv3x3_v2(x, w, relu=True)

    for mode in ("dma_ref", "mm_ref", "v2raw", "col3d", "nocol3d", "col9",
                 "acc_scr"):
        call = run_variant(xp, w2, h, wdt, cin, cout, mode)
        if mode not in ("dma_ref", "mm_ref"):
            try:
                got = cp.unpack_width2(call(xp), W)
                err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                print(f"#   {mode} maxdiff vs v2: {err:.2e}", flush=True)
                res[f"{mode}_maxdiff"] = err
            except Exception as e:  # noqa: BLE001
                print(f"# {mode}: BUILD FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                res[f"{mode}_ms"] = None
                continue
        res[f"{mode}_ms"] = timed_chain(mode, call, xp)

    for tile in ((224, 112), (112, 224), (56, 224), (224, 224)):
        name = f"v2raw_tile{tile[0]}x{tile[1]}"
        call = run_variant(xp, w2, h, wdt, cin, cout, "v2raw", tile=tile)
        res[f"{name}_ms"] = timed_chain(name, call, xp)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "conv_variants.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
