"""Build a fake ScanNet-layout scene for end-to-end CLI verification."""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import sys

import numpy as np
from PIL import Image

root = sys.argv[1]
import os
from os.path import join

name = "scene0000_00"
sp = join(root, "train/images", name)
H, W = 48, 64
UV_HEIGHTS = (48, 64)
ASPECT = 4 / 3
N = 6

for sub in ["color", "depth", "pose", "uv"] + [f"uv_{h}" for h in UV_HEIGHTS]:
    os.makedirs(join(sp, sub), exist_ok=True)

rng = np.random.default_rng(0)
for i in range(N):
    # structured rgb so content loss is meaningful
    ys, xs = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    img = np.stack([xs, ys, 0.5 + 0.3 * np.sin(8 * xs + i)], -1)
    Image.fromarray((img * 255).astype(np.uint8)).save(join(sp, "color", f"{i}.jpg"))
    depth = (1500 + 2000 * ys + 100 * i).astype(np.int32)
    Image.fromarray(depth, mode="I").save(join(sp, "depth", f"{i}.png"))
    pose = np.eye(4)
    pose[0, 3] = 0.05 * i
    with open(join(sp, "pose", f"{i}.txt"), "w") as f:
        for row in pose:
            f.write(" ".join(str(v) for v in row) + "\n")
    ah, aw = H * 2, W * 2
    ys2, xs2 = np.meshgrid(np.linspace(0, 1, ah), np.linspace(0, 1, aw), indexing="ij")
    cos = np.clip(1.0 - 0.8 * np.sqrt((xs2 - .5) ** 2 + (ys2 - .5) ** 2), 0.05, 1.0)
    np.save(join(sp, "uv", f"{i}.angle.npy"),
            np.repeat(cos[..., None], 3, -1).astype(np.float32))
    np.save(join(sp, "uv", f"{i}.rendered_depth.npy"),
            np.repeat((0.5 + 2 * ys2)[..., None], 3, -1).astype(np.float32))
    for lh in UV_HEIGHTS:
        lw = int(lh * ASPECT)
        ys3, xs3 = np.meshgrid(np.linspace(0, 1, lh), np.linspace(0, 1, lw), indexing="ij")
        u = 0.1 + 0.7 * xs3 + 0.02 * i
        v = 0.1 + 0.7 * ys3
        uv = np.stack([u, v, np.zeros_like(u)], -1).astype(np.float32)
        uv[:2, :2] = 0.0
        np.save(join(sp, f"uv_{lh}", f"{i}.npy"), uv)

with open(join(sp, f"{name}.txt"), "w") as f:
    f.write(f"fx_color = 60.0\nfy_color = 60.0\nmx_color = {W/2}\nmy_color = {H/2}\n")
    f.write(f"colorWidth = {W}\ncolorHeight = {H}\n")
print("fake scene at", sp)
