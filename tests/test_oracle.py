"""NumPy oracle for the stylizer forward.

A deliberately naive, loop-free-but-obvious NumPy implementation of every
layer type is compared against stylizer.apply (which carries several
exact-math rewrites: upsample-conv folding, s2d, fused instance norm,
static reflect-start padding). Any rewrite regression shows up here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer


def conv2d_np(x, w, b, stride=1, pad=0):
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (xp.shape[1] - kh) // stride + 1
    ow = (xp.shape[2] - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout), np.float64)
    for u in range(kh):
        for v in range(kw):
            patch = xp[:, u : u + oh * stride : stride, v : v + ow * stride : stride, :]
            out += np.einsum("nhwc,co->nhwo", patch, w[u, v].astype(np.float64))
    return out + b


def conv_transpose2d_np(x, w_flipped_hwio, b, stride, pad, adj):
    """Matches stylizer.conv_transpose2d's stored-weight convention."""
    # recover torch weight (I, O, kh, kw) from stored flipped HWIO
    w_t = np.transpose(w_flipped_hwio, (2, 3, 0, 1))[:, :, ::-1, ::-1]
    n, h, ww, cin = x.shape
    _, cout, kh, kw = w_t.shape
    oh = (h - 1) * stride - 2 * pad + kh + adj
    ow = (ww - 1) * stride - 2 * pad + kw + adj
    out = np.zeros((n, oh, ow, cout), np.float64)
    for ih in range(h):
        for iw in range(ww):
            for u in range(kh):
                for v in range(kw):
                    o_i, o_j = ih * stride - pad + u, iw * stride - pad + v
                    if 0 <= o_i < oh and 0 <= o_j < ow:
                        out[:, o_i, o_j, :] += x[:, ih, iw, :] @ w_t[:, :, u, v]
    return out + b


def instance_norm_np(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def oracle_apply(params, spec, x):
    x = np.asarray(x, np.float64)
    if spec.input_pad:
        p = spec.input_pad
        x = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")

    def norm(x, p):
        return instance_norm_np(x, np.asarray(p["scale"], np.float64),
                                np.asarray(p["bias"], np.float64))

    def block(x, p, padding, residual):
        inner_pad = 1 if padding == "zero" else 0
        h = x
        if padding in ("reflect", "replicate"):
            mode = "reflect" if padding == "reflect" else "edge"
            h = np.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        h = conv2d_np(h, np.asarray(p["conv1"]["w"]), np.asarray(p["conv1"]["b"]),
                      1, inner_pad)
        h = np.maximum(norm(h, p["norm1"]), 0)
        if padding in ("reflect", "replicate"):
            mode = "reflect" if padding == "reflect" else "edge"
            h = np.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        h = conv2d_np(h, np.asarray(p["conv2"]["w"]), np.asarray(p["conv2"]["b"]),
                      1, inner_pad)
        h = norm(h, p["norm2"])
        if not residual:
            return h
        skip = x[:, 2:-2, 2:-2, :] if padding in ("none", "reflect-start") else x
        return h + skip

    for i, layer in enumerate(spec.layers):
        name = f"layer{i:02d}"
        p = params.get(name)
        if layer.kind == "conv":
            if layer.pad_mode:
                pd = (layer.ksize - 1) // 2
                mode = "reflect" if layer.pad_mode == "reflect" else "edge"
                x = np.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)), mode=mode)
            x = conv2d_np(x, np.asarray(p["w"]), np.asarray(p["b"]),
                          layer.stride, layer.pad)
        elif layer.kind == "full_conv":
            x = conv_transpose2d_np(x, np.asarray(p["w"]), np.asarray(p["b"]),
                                    layer.stride, layer.pad, layer.out_adjust)
        elif layer.kind == "upsample":
            x = x.repeat(layer.scale, axis=1).repeat(layer.scale, axis=2)
        elif layer.kind == "conv_block":
            x = block(x, p, layer.block_padding, residual=False)
        elif layer.kind == "res_block":
            x = block(x, p, layer.block_padding, residual=True)
        if layer.norm_after:
            x = norm(x, params[name + "_norm"])
        if layer.relu_after:
            x = np.maximum(x, 0)
    return np.tanh(x) * spec.tanh_constant


CASES = [
    ("c3s1-4,d8,R8,U2,c3s1-3", "reflect-start"),
    ("c3s1-4,d8,R8,u8,c3s1-3", "zero"),
    ("c3s1-4,R4,C4,c3s1-3", "reflect"),
    ("c9s1-4,d8,R8,R8,U2,c3s1-3", "reflect-start"),
]


@pytest.mark.parametrize("arch,padding", CASES)
def test_stylizer_matches_numpy_oracle(arch, padding, rng):
    spec = arch_dsl.parse_arch(arch, in_channels=7, padding_type=padding)
    params = stylizer.init_params(jax.random.PRNGKey(0), spec)
    x = rng.normal(size=(2, 24, 24, 7)).astype(np.float32) * 10
    with jax.default_matmul_precision("highest"):
        got = np.asarray(stylizer.apply(params, spec, jnp.asarray(x)))
    want = oracle_apply(params, spec, x)
    np.testing.assert_allclose(got, want, atol=5e-3)
