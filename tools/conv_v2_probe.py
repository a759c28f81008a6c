"""A/B the conv3x3 formulations on the trunk-head shapes (round 5).

Measures forward and forward+backward time per conv for:
  xla        — the production _conv3x3 flip-VJP path (baseline)
  pallas_v1  — ops/conv_pallas.conv3x3_frozen (lane-padded im2col)
  pallas_v2  — ops/conv_pallas.conv3x3_v2 (width-packed, no lane padding,
               fused bias+relu)

Shapes are the level-3 head of the bench config (V=4). Writes
results/conv_v2_probe.json.

Usage: python tools/conv_v2_probe.py
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

from stylemesh_tpu.models.vgg import _conv3x3, _conv3x3_relu_v2
from stylemesh_tpu.ops.conv_im2col import conv3x3_relu_im2col
from stylemesh_tpu.ops.conv_pallas import conv3x3_frozen, conv3x3_v2
from stylemesh_tpu.utils.tpu_peaks import device_peaks

V = int(os.environ.get("PROBE_V", "4"))
INNER = 8
REPS = 5
SHAPES = [  # (name, h, w, cin, cout)
    ("conv1_2", 784, 1045, 64, 64),
    ("conv2_1", 392, 522, 64, 128),
    ("conv2_2", 392, 522, 128, 128),
    ("conv3_1", 196, 261, 128, 256),
]
if os.environ.get("PROBE_DEEP"):
    SHAPES += [("conv3_2", 196, 261, 256, 256),
               ("conv4_2", 98, 130, 512, 512)]
VARIANTS = os.environ.get("PROBE_VARIANTS", "xla,pallas_v2").split(",")


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    peak_fl, _ = device_peaks()
    prec = jax.lax.Precision.DEFAULT
    results = []
    rng = np.random.default_rng(0)
    for name, h, w, cin, cout in SHAPES:
        k = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.float32)
        x = jnp.asarray(rng.random((V, h, w, cin), np.float32), jnp.bfloat16)
        fl_f = 2.0 * 9 * cin * cout * h * w * V

        variants = {
            "xla": lambda c, k=k, b=b: jax.nn.relu(_conv3x3(c, k, b, prec)),
            "pallas_v1": lambda c, k=k, b=b: jax.nn.relu(
                conv3x3_frozen(c, k) + b.astype(jnp.bfloat16)),
            "pallas_v2": lambda c, k=k, b=b: _conv3x3_relu_v2(
                c, k, b.astype(jnp.float32), False),
            "xla_im2col": lambda c, k=k, b=b: conv3x3_relu_im2col(c, k, b),
        }
        variants = {k_: v_ for k_, v_ in variants.items() if k_ in VARIANTS}
        row = {"name": name, "h": h, "w": w, "cin": cin, "cout": cout,
               "ideal_f_ms": fl_f / peak_fl * 1e3}
        # parity check vs xla (forward), f32 reference on small slice
        y_ref = np.asarray(jax.jit(
            lambda c: jax.nn.relu(_conv3x3(c, k, b, prec)))(x)
            .astype(jnp.float32))
        for vn, fn in variants.items():
            try:
                if vn != "xla":
                    y = np.asarray(fn(x).astype(jnp.float32))
                    err = float(np.max(np.abs(y - y_ref)) /
                                (np.max(np.abs(y_ref)) + 1e-9))
                    row[f"{vn}_relerr"] = err

                def reps(c, fn=fn):
                    def body(c, _):
                        y = fn(c)
                        mix = (1.0 + 1e-12 * jnp.mean(y)).astype(c.dtype)
                        return (c * mix).astype(c.dtype), ()
                    c, _ = jax.lax.scan(body, c, None, length=INNER)
                    return jnp.sum(c.astype(jnp.float32))

                fwd = jax.jit(lambda c, fn=fn: jnp.sum(
                    jax.lax.scan(
                        lambda c, _: (
                            (c * (1.0 + 1e-12 * jnp.mean(fn(c))).astype(c.dtype)
                             ).astype(c.dtype), ()),
                        c, None, length=INNER)[0].astype(jnp.float32)))
                t_f = timed(fwd, x) / INNER
                row[f"{vn}_f_ms"] = t_f * 1e3
                row[f"{vn}_f_mfu"] = fl_f / t_f / peak_fl
                g = jax.jit(jax.grad(reps))
                t_fb = timed(g, x) / INNER
                row[f"{vn}_fb_ms"] = t_fb * 1e3
                row[f"{vn}_fb_mfu"] = 2 * fl_f / t_fb / peak_fl
            except Exception as e:
                row[f"{vn}_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"# {name} {vn}: " + json.dumps(
                {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                 for kk, vv in row.items() if kk.startswith(vn)}), flush=True)
        results.append(row)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "conv_v2_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
