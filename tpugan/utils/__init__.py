from tpugan.utils.config import BaseConfig, add_config_args, config_from_args, flag  # noqa: F401
