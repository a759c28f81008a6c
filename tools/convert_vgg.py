"""Convert the reference's Gatys VGG weights (vgg_conv.pth, a torch state
dict of 16 convs) — or torchvision's vgg16 checkpoint — to the framework's
.npz format.

    python tools/convert_vgg.py vgg_conv.pth vgg_conv.npz
    python tools/convert_vgg.py --torchvision vgg16-*.pth vgg16.npz
"""

import argparse
import sys

sys.path.insert(0, ".")

# torchvision vgg16 'features' indices of the 13 convs, in trunk order
_TORCHVISION_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_GATYS_NAMES_13 = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--torchvision", action="store_true",
                   help="src is a torchvision vgg16 state dict (13 convs; "
                        "the Gatys net's conv*_4 layers are absent and get "
                        "copied from conv*_3 — only use the first three convs "
                        "per block for losses in that case)")
    args = p.parse_args()

    import torch

    from stylemesh_tpu.models.vgg import convert_torch_state_dict, save_vgg_params

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if args.torchvision:
        mapped = {}
        for name, idx in zip(_GATYS_NAMES_13, _TORCHVISION_CONV_IDX):
            mapped[f"{name}.weight"] = sd[f"features.{idx}.weight"].numpy()
            mapped[f"{name}.bias"] = sd[f"features.{idx}.bias"].numpy()
        # vgg16 has no conv3_4/4_4/5_4; duplicate the *_3 weights so the
        # trunk stays runnable (losses should not select *_4 layers then)
        for blk in (3, 4, 5):
            mapped[f"conv{blk}_4.weight"] = mapped[f"conv{blk}_3.weight"]
            mapped[f"conv{blk}_4.bias"] = mapped[f"conv{blk}_3.bias"]
        sd = mapped
    else:
        sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_torch_state_dict(sd)
    save_vgg_params(params, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
