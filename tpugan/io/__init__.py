from tpugan.io.images import make_grid, save_image  # noqa: F401
from tpugan.io.checkpoint import save_pytree, load_pytree  # noqa: F401
