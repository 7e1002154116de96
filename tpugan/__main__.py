"""Unified CLI: ``python -m tpugan <model> [flags]``.

The reference's public API is ``cd implementations/<name>/ && python3
<name>.py [flags]`` (README.md:63-67); here every variant is a subcommand
with byte-identical flags, writing the same ``images/`` and ``saved_models/``
outputs relative to ``--output_dir`` (default CWD).
"""

from __future__ import annotations

import sys

from tpugan.models import registry


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "list"):
        print("usage: python -m tpugan <model> [flags]")
        print("implemented models:")
        for name in registry.available():
            print("  " + name)
        return 0
    name, rest = argv[0], argv[1:]
    mod = registry.get(name)
    mod.main(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
