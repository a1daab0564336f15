"""Multi-stream serving: independent video streams fanned over local devices.

The reference processes one video per process (stylizeVideo_*.sh); a
production deployment serves MANY streams. On TPU the scaling unit for
independent streams is the CHIP — batching frames on one chip pessimizes
(BENCH_NOTES "Batch=2 frames"), while streams on different chips share
nothing and scale linearly. `StreamPool` pins each stream's whole
recurrence to a device: the stylizer params (closed over as compile-time
constants), the streaming flow provider's pyramid cache, and the carried
stylized frame all live on that stream's chip; frames in, stylized frames
out, no cross-device traffic.

Single-host multi-device (jax.local_devices). The device-pinned dispatch
pattern is the 2-device flow/stylize pipelining already validated in
tests/test_parallel.py (placement follows committed inputs).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..flow import estimator as flow_estimator
from ..flow.provider import StreamingFlowProvider
from ..models import stylizer
from .engine import EngineConfig, StylizerEngine


class StreamPool:
    """S independent temporal-stylization streams over N local devices.

    Streams are assigned round-robin (stream i -> devices[i % N]). Each
    stream is sequential (frame t consumes stylized frame t-1); different
    streams' device programs run concurrently because their inputs are
    committed to different devices. Engines are shared per device (they
    are stateless between calls apart from the fill-noise RNG); flow
    providers are per stream (they cache the previous frame's pyramid).
    """

    def __init__(self, spec, params, flow_params=None, n_streams: int = 1,
                 devices: Optional[Sequence] = None, dtype: str = "bfloat16",
                 flow_scale: float = 1.0,
                 config: Optional[EngineConfig] = None):
        if n_streams < 1:
            raise ValueError("n_streams must be >= 1")
        devices = list(devices) if devices is not None else jax.local_devices()
        self.devices = devices
        self.n_streams = n_streams
        self._stream_dev = [devices[i % len(devices)] for i in range(n_streams)]
        cfg = config or EngineConfig(dtype=dtype)

        self._engines = {}
        for dev in set(self._stream_dev):
            params_dev = jax.device_put(params, dev)
            self._engines[dev] = StylizerEngine(
                lambda p, x: stylizer.apply(p, spec, x),
                params_vid=params_dev,
                stride_multiple=spec.total_stride,
                config=cfg,
            )

        self._providers: List[Optional[StreamingFlowProvider]] = [None] * n_streams
        if flow_params is not None:
            # one estimator per device (compiled programs shared among that
            # device's streams), one stateful provider per stream
            est = {
                dev: flow_estimator.FlowEstimator(
                    jax.device_put(flow_params, dev),
                    dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
                    device=dev)
                for dev in set(self._stream_dev)
            }
            self._providers = [
                StreamingFlowProvider(flow_estimator=est[self._stream_dev[i]],
                                      flow_scale=flow_scale)
                for i in range(n_streams)
            ]
        self._prev: List[Optional[jnp.ndarray]] = [None] * n_streams

    def device_of(self, stream: int):
        return self._stream_dev[stream]

    def reset(self, stream: int) -> None:
        """Start a new clip on this stream slot."""
        self._prev[stream] = None
        if self._providers[stream] is not None:
            self._providers[stream].reset()

    def process(self, stream: int, frame: np.ndarray,
                flow_cert=None, band_hint=None):
        """Feed the next frame of `stream`; returns the stylized frame as a
        DEVICE array on the stream's device (np.asarray for a host copy —
        keep it device-side when feeding sinks that accept device arrays).

        flow_cert: optional (backward_flow, certainty) when flow comes from
        files; omit to use the pool's streaming flow provider (flow_params
        at construction). The first frame of a stream (or after reset) is
        stylized independently, like the drivers."""
        dev = self._stream_dev[stream]
        eng = self._engines[dev]
        frame_dev = jax.device_put(jnp.asarray(frame), dev)
        if flow_cert is None and self._providers[stream] is not None:
            fc = self._providers[stream](frame_dev)
            if fc is not None:
                flow_cert = fc
                band_hint = self._providers[stream].last_band
        prev = self._prev[stream]
        if flow_cert is None or prev is None:
            out = eng.stylize_first(frame_dev)
        else:
            flow, cert = flow_cert
            out = eng.stylize_next(
                frame_dev, prev,
                jax.device_put(jnp.asarray(flow), dev),
                jax.device_put(jnp.asarray(cert), dev),
                band_hint,
            )
        self._prev[stream] = out
        return out
