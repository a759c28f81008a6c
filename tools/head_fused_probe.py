"""Time the fused conv+relu+pool kernel vs the unfused composition on the
real chip at the trunk block-tail shapes (level 3, V=4).

Usage: python tools/head_fused_probe.py   (writes results/head_fused.json)
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

from stylemesh_tpu.ops.conv_pallas import conv3x3_v2
from stylemesh_tpu.ops.head_pallas import conv_relu_pool

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
    except Exception as e:  # noqa: BLE001
        print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS / INNER * 1e3
    print(f"# {name}: {dt:.3f} ms/iter", flush=True)
    return dt


def pool(y):
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    rng = np.random.default_rng(0)
    res = {}
    for name, (v, h, wdt, c) in [("S1_conv1_2", (4, 784, 1045, 64)),
                                 ("S2_conv2_2", (4, 392, 522, 128))]:
        x = jnp.asarray(rng.normal(0, 1, (v, h, wdt, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32)

        fused = lambda t: conv_relu_pool(t, w, b)
        unfused = lambda t: pool(conv3x3_v2(t, w, b, relu=True))

        # parity spot-check on-device
        d = jnp.max(jnp.abs(jax.jit(fused)(x).astype(jnp.float32)
                            - jax.jit(unfused)(x).astype(jnp.float32)))
        print(f"# {name} maxdiff fused vs unfused: {float(d):.3e}", flush=True)
        res[f"{name}_maxdiff"] = float(d)

        res[f"{name}_fused_ms"] = timed_chain(f"{name} fused", fused, x)
        res[f"{name}_unfused_ms"] = timed_chain(f"{name} unfused(v2+pool)",
                                                unfused, x)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "head_fused.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
