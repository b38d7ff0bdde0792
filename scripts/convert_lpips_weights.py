"""Convert torchvision AlexNet + lpips-package linear heads → vit_tpu .npz.

Run anywhere torchvision and the ``lpips`` pip package are installed (this TPU
image has neither, and no network egress):

    python scripts/convert_lpips_weights.py --out lpips_alex.npz

Then pass the file to eval_recon.py via --lpips_weights. Mapping targets the
official LPIPS 'alex' configuration the reference imports (train_titok.py:1,
unused — SURVEY.md §2d.8) and BASELINE.md's "recon PSNR/LPIPS parity" north
star. Golden-tested against a hand-built torch twin in
tests/test_lpips_golden.py.

Key layout produced (vit_tpu/losses/lpips.py tree):
    alex/conv{0..4}/kernel   (kH, kW, I, O)   from torchvision alexnet
    alex/conv{0..4}/bias     (O,)             features.{0,3,6,8,10}
    lin{0..4}                (C,)             from lpips lin{i}.model.1.weight
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision alexnet ``features`` indices of the five convs
ALEXNET_FEATURE_IDX = (0, 3, 6, 8, 10)


def convert(alexnet_sd, lpips_sd) -> dict:
    """(torchvision alexnet state_dict, lpips.LPIPS(net='alex') state_dict) →
    flat {key: ndarray}. Tensors may be torch tensors or numpy arrays."""

    def arr(t):
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)

    out = {}
    for i, fi in enumerate(ALEXNET_FEATURE_IDX):
        w = arr(alexnet_sd[f"features.{fi}.weight"])  # (O, I, kH, kW)
        out[f"alex/conv{i}/kernel"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0))
        out[f"alex/conv{i}/bias"] = arr(alexnet_sd[f"features.{fi}.bias"])
    for i in range(5):
        # lpips package: lin{i}.model.1 is a bias-free 1×1 Conv2d (C_out=1)
        w = arr(lpips_sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        out[f"lin{i}"] = np.ascontiguousarray(w.reshape(-1))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="lpips_alex.npz")
    args = parser.parse_args()

    import lpips as lpips_pkg
    from torchvision import models

    alexnet_sd = models.alexnet(
        weights=models.AlexNet_Weights.IMAGENET1K_V1).state_dict()
    lpips_sd = lpips_pkg.LPIPS(net="alex").state_dict()
    flat = convert(alexnet_sd, lpips_sd)
    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
