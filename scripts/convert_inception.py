#!/usr/bin/env python
"""Convert a torchvision inception_v3 checkpoint to tpugan's
inception_v3.npz (the FID backbone drop-in, tpugan/metrics/inception.py).

Usage (on a machine with the checkpoint / torchvision):

    python scripts/convert_inception.py inception_v3_google-0cc3c7bd.pth \
        out/inception_v3.npz
    python scripts/convert_inception.py --download out/inception_v3.npz

Keeps the feature-trunk entries in state_dict order (the interop pairing
is order-sensitive) and drops AuxLogits.* / fc.* — neither exists in the
flax trunk. Drop the npz under ``--data_dir`` to make FID numbers
literature-comparable.
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
        if key.startswith(("AuxLogits.", "fc.")):
            continue
        arrays[key] = np.asarray(value, dtype=np.float32)
    if not arrays:
        raise SystemExit("no feature-trunk arrays found in the checkpoint")
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", help="path to inception_v3 .pth state_dict")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--download", action="store_true",
                    help="fetch via torchvision instead of a local file")
    args = ap.parse_args()

    if args.download:
        from torchvision.models import inception_v3

        sd = inception_v3(pretrained=True, aux_logits=True).state_dict()
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
