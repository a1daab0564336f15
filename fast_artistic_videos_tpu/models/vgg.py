"""VGG-16 loss network as a pure feature extractor with taps.

The reference surgically inserts mode-switched loss probes into a loaded
Torch VGG-16 and trims it after the last probe
(PerceptualCriterion.lua:27-67, layer_utils.trim_network). Here the network
is a pure function: ``extract_features(params, x, taps)`` returns the
activations at the requested *Torch sequential layer indices* (1-based), so
the reference's layer ids ("4,9,16,23" = relu1_2, relu2_2, relu3_3, relu4_3)
address the same tensors. The net is only evaluated up to the deepest tap.

Input is VGG-preprocessed (BGR, x255, mean-subtracted) NHWC. Weights load
from the t7 importer or random-init (tests / training without the
pretrained loss net is supported but not meaningful for style quality).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

# (torch_index, op, in_ch, out_ch); pools are 2x2/2 max pools.
# Full conv stack of VGG-16 (through conv5_3); linear head is never needed.
VGG16_LAYOUT: Tuple[Tuple[int, str, int, int], ...] = tuple(
    (i + 1, op, a, b)
    for i, (op, a, b) in enumerate(
        [
            ("conv", 3, 64), ("relu", 0, 0), ("conv", 64, 64), ("relu", 0, 0), ("pool", 0, 0),
            ("conv", 64, 128), ("relu", 0, 0), ("conv", 128, 128), ("relu", 0, 0), ("pool", 0, 0),
            ("conv", 128, 256), ("relu", 0, 0), ("conv", 256, 256), ("relu", 0, 0),
            ("conv", 256, 256), ("relu", 0, 0), ("pool", 0, 0),
            ("conv", 256, 512), ("relu", 0, 0), ("conv", 512, 512), ("relu", 0, 0),
            ("conv", 512, 512), ("relu", 0, 0), ("pool", 0, 0),
            ("conv", 512, 512), ("relu", 0, 0), ("conv", 512, 512), ("relu", 0, 0),
            ("conv", 512, 512), ("relu", 0, 0), ("pool", 0, 0),
        ]
    )
)


def init_params(key) -> Dict[str, Dict[str, jnp.ndarray]]:
    params = {}
    for idx, op, cin, cout in VGG16_LAYOUT:
        if op != "conv":
            continue
        key, k1, k2 = jax.random.split(key, 3)
        stdv = 1.0 / (3 * 3 * cin) ** 0.5
        params[f"conv{idx:02d}"] = {
            "w": jax.random.uniform(k1, (3, 3, cin, cout), jnp.float32, -stdv, stdv),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -stdv, stdv),
        }
    return params


def extract_features(params, x, taps: Sequence[int]):
    """x: (N, H, W, 3) VGG-preprocessed. Returns {tap_index: (N, h, w, c)}."""
    taps = tuple(int(t) for t in taps)
    deepest = max(taps)
    feats = {}
    for idx, op, _, _ in VGG16_LAYOUT:
        if op == "conv":
            p = params[f"conv{idx:02d}"]
            x = jax.lax.conv_general_dilated(
                x,
                p["w"].astype(x.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + p["b"].astype(x.dtype)
        elif op == "relu":
            x = jax.nn.relu(x)
        elif op == "pool":
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
        if idx in taps:
            feats[idx] = x
        if idx >= deepest:
            break
    missing = set(taps) - set(feats)
    if missing:
        raise ValueError(f"invalid VGG tap indices: {sorted(missing)}")
    return feats
