"""Convert torchvision ConvNeXt-Small ImageNet weights → vit_tpu .npz.

Run anywhere torchvision is installed (this TPU image has no torchvision and no
network egress):

    python scripts/convert_perceptual_weights.py --out convnext_s_imagenet.npz

Then pass the file to the train scripts via --perceptual_weights. Mapping mirrors the
reference's frozen model (perceptual_loss.py:41): torchvision
``convnext_small(weights=IMAGENET1K_V1)``.
"""

from __future__ import annotations

import argparse

import numpy as np

DEPTHS = (3, 3, 27, 3)


def convert(state_dict) -> dict:
    out = {}

    def conv_w(t):  # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
        return np.ascontiguousarray(t.numpy().transpose(2, 3, 1, 0))

    def lin_w(t):   # torch (O, I) -> flax (I, O)
        return np.ascontiguousarray(t.numpy().transpose(1, 0))

    sd = state_dict
    # stem: features.0.0 conv, features.0.1 LN
    out["stem_conv/kernel"] = conv_w(sd["features.0.0.weight"])
    out["stem_conv/bias"] = sd["features.0.0.bias"].numpy()
    out["stem_norm/scale"] = sd["features.0.1.weight"].numpy()
    out["stem_norm/bias"] = sd["features.0.1.bias"].numpy()

    # torchvision layout: features[1,3,5,7] = stages, features[2,4,6] = downsample
    for stage in range(4):
        feat_idx = 1 + 2 * stage
        if stage > 0:
            ds = f"features.{feat_idx - 1}"
            out[f"downsample_norm_{stage}/scale"] = sd[f"{ds}.0.weight"].numpy()
            out[f"downsample_norm_{stage}/bias"] = sd[f"{ds}.0.bias"].numpy()
            out[f"downsample_conv_{stage}/kernel"] = conv_w(sd[f"{ds}.1.weight"])
            out[f"downsample_conv_{stage}/bias"] = sd[f"{ds}.1.bias"].numpy()
        for block in range(DEPTHS[stage]):
            src = f"features.{feat_idx}.{block}"
            dst = f"stage{stage}_block{block}"
            out[f"{dst}/gamma"] = sd[f"{src}.layer_scale"].numpy().reshape(-1)
            out[f"{dst}/dwconv/kernel"] = conv_w(sd[f"{src}.block.0.weight"])
            out[f"{dst}/dwconv/bias"] = sd[f"{src}.block.0.bias"].numpy()
            out[f"{dst}/norm/scale"] = sd[f"{src}.block.2.weight"].numpy()
            out[f"{dst}/norm/bias"] = sd[f"{src}.block.2.bias"].numpy()
            out[f"{dst}/pwconv1/kernel"] = lin_w(sd[f"{src}.block.3.weight"])
            out[f"{dst}/pwconv1/bias"] = sd[f"{src}.block.3.bias"].numpy()
            out[f"{dst}/pwconv2/kernel"] = lin_w(sd[f"{src}.block.5.weight"])
            out[f"{dst}/pwconv2/bias"] = sd[f"{src}.block.5.bias"].numpy()

    out["head_norm/scale"] = sd["classifier.0.weight"].numpy()
    out["head_norm/bias"] = sd["classifier.0.bias"].numpy()
    out["head/kernel"] = lin_w(sd["classifier.2.weight"])
    out["head/bias"] = sd["classifier.2.bias"].numpy()
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="convnext_s_imagenet.npz")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="optional local .pth state_dict instead of torchvision hub")
    args = parser.parse_args()

    if args.ckpt:
        import torch

        sd = torch.load(args.ckpt, map_location="cpu")
    else:
        from torchvision import models

        sd = models.convnext_small(
            weights=models.ConvNeXt_Small_Weights.IMAGENET1K_V1).state_dict()
    np.savez(args.out, **convert(sd))
    print(f"wrote {args.out} ({len(convert(sd))} arrays)")


if __name__ == "__main__":
    main()
