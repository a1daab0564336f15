"""Native model checkpoint format: a single .npz with flattened params plus
an arch-metadata JSON — self-describing the way the reference's .t7
checkpoints carry their nn graph (train_video.lua:523-541 saves
{model=..., opt=..., iter=...}).

Training state (optimizer, loss history) is checkpointed separately by the
trainer via orbax; this format is the *portable model* artifact consumed by
the inference CLIs and produced by the t7 importer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .arch_dsl import ModelSpec, parse_arch


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_model(path: str, params: Dict[str, Any], meta: Dict[str, Any]) -> None:
    """meta must include: arch, in_channels, padding_type, use_instance_norm,
    tanh_constant. Extra keys (style name, training iter, ...) are kept."""
    flat = _flatten(params)
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_model(path: str) -> Tuple[ModelSpec, Dict[str, Any], Dict[str, Any]]:
    """Returns (spec, params, meta). The literal string ``demo`` resolves
    to the bundled in-tree demo checkpoint (assets/demo-candy-video.npz,
    canonical arch trained on procedural data against the candy style
    fixture) so every stylize CLI runs out of the box with zero
    downloads — unlike the reference, whose models only exist behind
    download_models.sh."""
    if path == "demo":
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "demo-candy-video.npz")
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode())
    params = _unflatten(flat)
    if "layers" in meta:
        # explicit layer list (t7-imported models have no arch string)
        from .arch_dsl import LayerSpec

        layers = tuple(LayerSpec(**l) for l in meta["layers"])
        spec = ModelSpec(
            layers=layers,
            in_channels=int(meta.get("in_channels", 7)),
            padding_type=meta.get("padding_type", "reflect-start"),
            use_instance_norm=bool(meta.get("use_instance_norm", True)),
            tanh_constant=float(meta.get("tanh_constant", 150.0)),
            input_pad=int(meta.get("input_pad", 0)),
            total_stride=int(meta.get("total_stride", 1)),
        )
    else:
        spec = parse_arch(
            meta["arch"],
            in_channels=int(meta.get("in_channels", 7)),
            padding_type=meta.get("padding_type", "reflect-start"),
            use_instance_norm=bool(meta.get("use_instance_norm", True)),
            tanh_constant=float(meta.get("tanh_constant", 150.0)),
        )
    return spec, params, meta
