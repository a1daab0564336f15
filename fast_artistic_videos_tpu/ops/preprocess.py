"""Image pre/deprocessing for VGG- and ResNet-space networks.

Numerically matches the reference (fast_artistic_video/preprocess.lua):
  * vgg:    RGB[0,1] NHWC  ->  BGR*255 - mean(103.939, 116.779, 123.68)
  * resnet: (x - mean) / std with the fb.resnet.torch ImageNet constants.

All functions operate on NHWC (or HWC) arrays and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

# Means are in *BGR* channel order, as in preprocess.lua:46.
VGG_MEAN_BGR = (103.939, 116.779, 123.68)

RESNET_MEAN = (0.485, 0.456, 0.406)
RESNET_STD = (0.229, 0.224, 0.225)


def _const(values, x):
    return jnp.asarray(values, dtype=x.dtype)


def vgg_preprocess(img):
    """RGB [0,1] (..., H, W, 3) -> VGG space (BGR, *255, mean-subtracted)."""
    bgr = img[..., ::-1]
    return bgr * jnp.asarray(255.0, img.dtype) - _const(VGG_MEAN_BGR, img)


def vgg_deprocess(img):
    """VGG space -> RGB [0,1]. Exact inverse of :func:`vgg_preprocess`."""
    bgr = (img + _const(VGG_MEAN_BGR, img)) / jnp.asarray(255.0, img.dtype)
    return bgr[..., ::-1]


def resnet_preprocess(img):
    return (img - _const(RESNET_MEAN, img)) / _const(RESNET_STD, img)


def resnet_deprocess(img):
    return img * _const(RESNET_STD, img) + _const(RESNET_MEAN, img)


PREPROCESS = {
    "vgg": (vgg_preprocess, vgg_deprocess),
    "resnet": (resnet_preprocess, resnet_deprocess),
}
