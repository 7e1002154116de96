"""Standalone ESRGAN inference CLI (the reference zoo's only non-training
entry point, /root/reference/implementations/esrgan/test_on_image.py):

    python -m tpugan test_on_image --image_path X --checkpoint_model Y
"""

from tpugan.models.esrgan import (  # noqa: F401
    TestOnImageConfig as Config,
    infer_image,
    main_test_on_image as main,
)

NAME = "test_on_image"

if __name__ == "__main__":
    main()
