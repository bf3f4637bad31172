#!/usr/bin/env python
"""Fetch torchvision ImageNet-pretrained ConvNeXt weights and save them as an
npz ready for gecco_tpu's converter.

The reference's conditional models consume ImageNet-pretrained extractors
(gecco-torch/src/gecco_torch/models/feature_pyramid.py:17-73, gecco-jax via
eqxvision feature_pyramid.py:58-94); conditioning quality depends on them.
This container has no network egress — run this script where you have it:

    python scripts/fetch_convnext_weights.py --size tiny --out convnext_tiny.npz

then point the conditional configs at the file:

    GECCO_CONVNEXT_WEIGHTS=convnext_tiny.npz \
        python -m gecco_tpu.train configs/taskonomy_conditional.py

The npz stores the torchvision state_dict keys verbatim (numpy values);
gecco_tpu.models.convnext.load_torchvision_state_dict performs the layout
conversion (OIHW->HWIO etc.) and is parity-tested against a hand-built torch
forward in tests/test_conditional.py.
"""

import argparse
import io
import sys
import urllib.request

import numpy as np

# torchvision.models.convnext weight URLs (IMAGENET1K_V1)
URLS = {
    "tiny": "https://download.pytorch.org/models/convnext_tiny-983f1562.pth",
    "small": "https://download.pytorch.org/models/convnext_small-0c510722.pth",
}


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--size", choices=sorted(URLS), default="tiny")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    try:
        import torch
    except ImportError:
        sys.exit("torch (cpu is fine) is required to read the .pth file")

    print(f"Downloading {URLS[args.size]} ...")
    with urllib.request.urlopen(URLS[args.size]) as r:
        buf = io.BytesIO(r.read())

    state_dict = torch.load(buf, map_location="cpu", weights_only=True)
    arrays = {
        k: v.numpy()
        for k, v in state_dict.items()
        if k.startswith("features.")  # drop the classifier head
    }
    np.savez(args.out, **arrays)
    print(f"Wrote {len(arrays)} tensors to {args.out}")


if __name__ == "__main__":
    main()
