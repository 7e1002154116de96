#!/usr/bin/env python
"""Convert checkpoints between the reference (torch state_dict .pth) and
tpugan (flax msgpack .pth) formats — the migration path for users arriving
from the reference zoo with trained weights, and back.

Import a reference checkpoint into a tpugan module file:

    PYTHONPATH=/root/repo python scripts/torch_checkpoint.py import \
        --model cyclegan --module G_AB --torch_pth /path/G_AB_140.pth \
        --out saved_models/monet2photo/G_AB_140.pth [--<model flags>...]

Export a tpugan module file as a reference-loadable state_dict (the key
names/ordering come from --template, any state_dict of the same reference
architecture — e.g. the file you originally imported):

    PYTHONPATH=/root/repo python scripts/torch_checkpoint.py export \
        --model cyclegan --module G_AB --state saved_models/.../G_AB_150.pth \
        --template /path/G_AB_140.pth --out /path/G_AB_150_torch.pth

Model flags after the fixed arguments are forwarded to the recipe's Config
parser so architecture-shaping options (--n_residual_blocks, --img_size,
--channels, ...) match the checkpoint being converted.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["import", "export"])
    ap.add_argument("--model", required=True)
    ap.add_argument("--module", required=True,
                    help="module role, e.g. generator / G_AB / discriminator")
    ap.add_argument("--torch_pth", help="[import] source torch checkpoint")
    ap.add_argument("--state", help="[export] source tpugan module .pth")
    ap.add_argument("--template",
                    help="[export] torch state_dict supplying key names")
    ap.add_argument("--out", required=True)
    args, model_argv = ap.parse_known_args()

    import torch

    from tpugan.io.checkpoint import load_module_payload, module_payload, save_pytree
    from tpugan.io.torch_interop import export_state_dict, import_state_dict
    from tpugan.models import registry
    from tpugan.utils.config import config_from_args

    recipe = registry.get(args.model)
    cfg = config_from_args(recipe.Config, model_argv)
    modules = recipe.build(cfg)
    if args.module not in modules:
        sys.exit(
            f"unknown --module {args.module!r}; available: "
            + ", ".join(modules)
        )
    state = recipe.create_state(cfg, modules)
    params = state.params[args.module]
    bs = (state.model_state or {}).get(args.module)

    if args.mode == "import":
        if not args.torch_pth:
            sys.exit("import requires --torch_pth")
        sd = torch.load(args.torch_pth, map_location="cpu")
        new_params, new_bs = import_state_dict(params, sd, bs)
        # Write the standard per-module payload (params + running stats,
        # io/checkpoint.py:module_payload) so --epoch resume and eval-mode
        # forwards see the torch model's BatchNorm statistics.
        save_pytree(module_payload(new_params, new_bs), args.out)
        print(f"imported {args.torch_pth} -> {args.out}")
    else:
        if not (args.state and args.template):
            sys.exit("export requires --state and --template")
        payload = load_module_payload(params, args.state, bs)
        template = torch.load(args.template, map_location="cpu")
        out_sd = export_state_dict(
            payload["params"], template, payload["batch_stats"] or None
        )
        torch.save(out_sd, args.out)
        print(f"exported {args.state} -> {args.out}")


if __name__ == "__main__":
    main()
