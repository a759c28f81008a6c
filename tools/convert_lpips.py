"""Convert the pip `lpips` package's calibrated linear weights (vgg variant)
to the .npz consumed by stylemesh_tpu.eval.lpips.LPIPSDistance.

    python tools/convert_lpips.py <lpips_vgg.pth or installed-package> out.npz

The state dict keys are ``lin{0..4}.model.1.weight`` with shapes [1, C, 1, 1].
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from stylemesh_tpu.eval.lpips import LPIPS_LAYERS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="lpips state dict (.pth)")
    p.add_argument("dst")
    args = p.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    out = {}
    for i, layer in enumerate(LPIPS_LAYERS):
        w = sd[f"lin{i}.model.1.weight"].numpy()
        out[layer] = np.squeeze(w).astype(np.float32)  # [C]
    np.savez(args.dst, **out)
    print(f"wrote {args.dst}: " + ", ".join(
        f"{k}[{v.shape[0]}]" for k, v in out.items()))


if __name__ == "__main__":
    main()
