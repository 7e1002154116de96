#!/usr/bin/env python
"""Convert a torchvision VGG19 checkpoint to tpugan's vgg19_features.npz.

Usage (on a machine with torchvision + network access):

    python scripts/convert_vgg19.py /path/to/vgg19-dcbb9e9d.pth out/vgg19_features.npz

or, if torchvision is importable with download access:

    python scripts/convert_vgg19.py --download out/vgg19_features.npz

The output npz holds ``conv<i>_kernel`` (HWIO float32) and ``conv<i>_bias``
for every conv index ``i`` of torch's ``vgg19().features`` Sequential —
the layout consumed by tpugan.nn.vgg.load_vgg19_npz. Drop the file under
``--data_dir`` to enable pretrained perceptual losses in srgan/esrgan.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def convert(state_dict, out_path: str) -> None:
    arrays = {}
    for key, value in state_dict.items():
        # keys look like "features.0.weight" / "features.0.bias".
        parts = key.split(".")
        if len(parts) != 3 or parts[0] != "features":
            continue
        idx, kind = parts[1], parts[2]
        w = np.asarray(value, dtype=np.float32)
        if kind == "weight":
            # torch OIHW -> flax HWIO.
            arrays[f"conv{idx}_kernel"] = w.transpose(2, 3, 1, 0)
        elif kind == "bias":
            arrays[f"conv{idx}_bias"] = w
    if not arrays:
        raise SystemExit("no features.* conv arrays found in the checkpoint")
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", help="path to vgg19 .pth state_dict")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--download", action="store_true",
                    help="fetch via torchvision instead of a local file")
    args = ap.parse_args()

    if args.download:
        from torchvision.models import vgg19

        sd = vgg19(pretrained=True).state_dict()
    else:
        if not args.src:
            ap.error("src path required without --download")
        import torch

        sd = torch.load(args.src, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    convert(sd, args.out)


if __name__ == "__main__":
    sys.exit(main())
