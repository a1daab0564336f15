"""fast_artistic_videos_tpu — TPU-native video style transfer framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of
manuelruder/fast-artistic-videos (Torch7/Lua/CUDA): feed-forward, temporally
consistent artistic style transfer for videos and spherical (360°) videos.

Layout conventions (TPU-native, differ deliberately from the Torch reference):
  * Images are NHWC float32/bfloat16 arrays; RGB in [0, 1] at the API surface.
  * Optical flow is (..., H, W, 2) with channel 0 = dx (u, horizontal) and
    channel 1 = dy (v, vertical) — the Middlebury .flo file order. (The
    reference swaps to (y, x) channel order internally for Torch's
    ``image.warp``; we keep file order and document it at every call site.)
  * All hot paths are pure functions under ``jax.jit``; parallelism is
    expressed with ``jax.sharding.Mesh`` + ``shard_map``, not processes.

Subpackages:
  core      config/flag registry, the five mini-DSL parsers, file codecs
  ops       warp (Pallas + XLA), filters, gram, preprocess, tv, consistency
  models    arch-string DSL -> stylizer network, VGG loss network, t7 import
  flow      on-TPU optical flow estimation + flow-file production pipeline
  video     the generic prior-conditioned stylization engine + video/VR drivers
  train     losses, data sources (real HDF5 + synthetic), trainer
  parallel  mesh construction, data-parallel training, spatial halo sharding
  utils     profiling, async prefetch/writeback pipelines
"""

__version__ = "0.1.0"
