from .bias_act import activation_funcs, bias_act  # noqa: F401
from .conv2d_resample import conv2d_resample  # noqa: F401
from .modulated_conv2d import modulated_conv2d  # noqa: F401
from .upfirdn2d import (  # noqa: F401
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
