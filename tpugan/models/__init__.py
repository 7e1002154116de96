"""Model recipe registry.

One module per reference script (33 total —
/root/reference/implementations/<name>/). Each recipe module exposes:

- ``Config``  dataclass with flag-parity fields
- ``build(cfg)``        -> dict[str, nn.Module]
- ``create_state(cfg, modules)`` -> TrainState
- ``make_step(cfg, modules)``    -> jittable (state, *batch) -> (state, out)
- ``run(cfg)``          -> full training loop (CLI entry)
"""

from __future__ import annotations

import importlib

# name -> module path (filled in as recipes land; parity target = all 33).
_REGISTRY = {
    "gan": "tpugan.models.gan",
    "dcgan": "tpugan.models.dcgan",
    "lsgan": "tpugan.models.lsgan",
    "wgan": "tpugan.models.wgan",
    "wgan_gp": "tpugan.models.wgan_gp",
    "wgan_div": "tpugan.models.wgan_div",
    "dragan": "tpugan.models.dragan",
    "cgan": "tpugan.models.cgan",
    "acgan": "tpugan.models.acgan",
    "sgan": "tpugan.models.sgan",
    "infogan": "tpugan.models.infogan",
    "bgan": "tpugan.models.bgan",
    "softmax_gan": "tpugan.models.softmax_gan",
    "relativistic_gan": "tpugan.models.relativistic_gan",
    "ebgan": "tpugan.models.ebgan",
    "began": "tpugan.models.began",
    "aae": "tpugan.models.aae",
    "cogan": "tpugan.models.cogan",
    "pixelda": "tpugan.models.pixelda",
    "cluster_gan": "tpugan.models.cluster_gan",
    "pix2pix": "tpugan.models.pix2pix",
    "cyclegan": "tpugan.models.cyclegan",
    "discogan": "tpugan.models.discogan",
    "dualgan": "tpugan.models.dualgan",
    "bicyclegan": "tpugan.models.bicyclegan",
    "munit": "tpugan.models.munit",
    "unit": "tpugan.models.unit",
    "stargan": "tpugan.models.stargan",
    "srgan": "tpugan.models.srgan",
    "esrgan": "tpugan.models.esrgan",
    "context_encoder": "tpugan.models.context_encoder",
    "ccgan": "tpugan.models.ccgan",
    # The reference zoo's standalone inference CLI (esrgan/test_on_image.py).
    "test_on_image": "tpugan.models.test_on_image",
}


class registry:
    @staticmethod
    def names():
        return sorted(_REGISTRY)

    @staticmethod
    def available():
        out = []
        for name in sorted(_REGISTRY):
            try:
                importlib.import_module(_REGISTRY[name])
                out.append(name)
            except ModuleNotFoundError:
                pass
        return out

    @staticmethod
    def get(name: str):
        if name not in _REGISTRY:
            raise KeyError(
                f"unknown model {name!r}; known: {', '.join(sorted(_REGISTRY))}"
            )
        return importlib.import_module(_REGISTRY[name])
