"""Re-locate the wall for the 64-ch trunk head on real hardware.

Measurement methodology matters on the tunnel backend: single dispatches
pipeline/cache and report nonsense (a 60-GFLOP conv "measured" at 0.03 ms),
so every variant here runs INNER chained iterations in-graph — the scan
carry mixes a scalar of the output back into the input, forcing sequential
execution (same trick as tools/mfu_probe.py).

Times, per iteration, on the conv1_2 level-3 shape [4,784,1045,64]:
- XLA spatial conv fwd (the incumbent)
- v2 width-packed Pallas conv fwd (wrapped)
- elementwise HBM copy of the same activation (bandwidth roofline)

Usage: python tools/conv_wall_probe.py   (writes results/conv_wall.json)
"""

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

from stylemesh_tpu.ops import conv_pallas as cp

B, H, W, C = 4, 784, 1045, 64
REPS, INNER = 5, 8


def timed_chain(name, make_y, x):
    """Time one op per INNER chained in-graph iterations."""
    def reps(x):
        def body(c, _):
            y = make_y(c)
            mix = (1.0 + 1e-12 * jnp.mean(y.astype(jnp.float32))).astype(c.dtype)
            return c * mix, ()
        c, _ = jax.lax.scan(body, x, None, length=INNER)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(reps)
    out = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS / INNER * 1e3
    print(f"# {name}: {dt:.3f} ms/iter", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    res = {"shape": [B, H, W, C], "inner": INNER}

    def xla_conv(c):
        return jax.lax.conv_general_dilated(
            c, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    res["copy_ms"] = timed_chain("hbm copy (x*1.0001)", lambda c: c * 1.0001, x)
    nbytes = 2 * x.size * x.dtype.itemsize
    res["copy_gbps"] = nbytes / (res["copy_ms"] / 1e3) / 1e9
    print(f"#   -> effective {res['copy_gbps']:.0f} GB/s")
    res["xla_f_ms"] = timed_chain("xla conv fwd", xla_conv, x)
    res["v2_f_ms"] = timed_chain(
        "v2 pallas conv fwd", lambda c: cp.conv3x3_v2(c, w, relu=True), x)
    res["ideal_f_ms"] = 2.0 * 9 * C * C * H * W * B / 197e12 * 1e3

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "conv_wall.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
