from tpugan.ops.init import (  # noqa: F401
    torch_kaiming_uniform,
    torch_bias_uniform,
    normal_init,
    ones_normal_init,
)
from tpugan.ops.image import (  # noqa: F401
    pixel_shuffle,
    upsample_nearest,
    reflection_pad_2d,
    zero_pad_2d,
    resize_bilinear,
    avg_pool,
)
from tpugan.ops.penalty import (  # noqa: F401
    wgan_gp_penalty,
    dragan_penalty,
    wdiv_penalty,
)
