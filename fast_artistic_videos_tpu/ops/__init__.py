from .preprocess import vgg_preprocess, vgg_deprocess, resnet_preprocess, resnet_deprocess  # noqa: F401
from .filters import min_filter, median_filter, flow_magnitude_mask  # noqa: F401
from .warp import bilinear_warp  # noqa: F401
from .gram import gram_matrix  # noqa: F401
from .tv import tv_loss  # noqa: F401
