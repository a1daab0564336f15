import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, checkpoint, stylizer, t7


def test_t7_roundtrip_scalars_and_tables(tmp_path):
    obj = {
        "a": 1,
        "b": 2.5,
        "c": "hello",
        "d": True,
        "e": None,
        "nested": {"x": [1.0, 2.0, 3.0]},
    }
    p = str(tmp_path / "x.t7")
    t7.save_t7(p, obj)
    out = t7.load_t7(p)
    assert out["a"] == 1 and out["b"] == 2.5 and out["c"] == "hello"
    assert out["d"] is True and out["e"] is None
    assert out["nested"]["x"] == {1: 1.0, 2: 2.0, 3: 3.0}


def test_t7_roundtrip_tensors(tmp_path, rng):
    arrs = {
        "f32": rng.normal(size=(3, 4, 5)).astype(np.float32),
        "f64": rng.normal(size=(2, 2)).astype(np.float64),
        "i64": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    p = str(tmp_path / "t.t7")
    t7.save_t7(p, arrs)
    out = t7.load_t7(p)
    for k, v in arrs.items():
        np.testing.assert_array_equal(out[k], v)


def test_t7_shared_object_references(tmp_path):
    shared = {"v": 1}
    obj = {"a": shared, "b": shared}
    p = str(tmp_path / "s.t7")
    t7.save_t7(p, obj)
    out = t7.load_t7(p)
    assert out["a"] is out["b"]


def _torch_conv(w_oihw, b, k, stride, pad):
    return t7.TorchObject("nn.SpatialConvolution", {
        "weight": w_oihw, "bias": b,
        "nInputPlane": w_oihw.shape[1], "nOutputPlane": w_oihw.shape[0],
        "kW": k, "kH": k, "dW": stride, "dH": stride, "padW": pad, "padH": pad,
    })


def _torch_in(c, rng):
    return t7.TorchObject("nn.InstanceNormalization", {
        "weight": rng.random(c).astype(np.float64),
        "bias": rng.normal(size=c).astype(np.float64),
        "nOutput": c, "eps": 1e-5,
    })


def _seq(mods):
    return t7.TorchObject("nn.Sequential", {"modules": list(mods)})


def _reference_style_checkpoint(rng, in_ch=7):
    """Build a t7 module tree shaped exactly like the reference builder's
    output for arch 'c3s1-4,d8,R8,U2,c3s1-3' with reflect-start padding
    (incl. the lazily inserted input reflection pad)."""
    C = 4
    convs = {}

    def conv(name, i, o, k, s, p):
        convs[name] = (
            rng.normal(size=(o, i, k, k)).astype(np.float64) * 0.2,
            rng.normal(size=o).astype(np.float64) * 0.1,
        )
        return _torch_conv(convs[name][0], convs[name][1], k, s, p)

    res_block = _seq([
        t7.TorchObject("nn.ConcatTable", {"modules": [
            _seq([
                conv("r1", 8, 8, 3, 1, 0),
                _torch_in(8, rng),
                t7.TorchObject("nn.ReLU", {}),
                conv("r2", 8, 8, 3, 1, 0),
                _torch_in(8, rng),
            ]),
            t7.TorchObject("nn.ShaveImage", {"size": 2}),
        ]}),
        t7.TorchObject("nn.CAddTable", {}),
    ])
    model = _seq([
        t7.TorchObject("nn.SpatialReflectionPadding",
                       {"pad_l": 4, "pad_r": 4, "pad_t": 4, "pad_b": 4}),
        conv("c1", in_ch, C, 3, 1, 1),
        _torch_in(C, rng),
        t7.TorchObject("nn.ReLU", {}),
        conv("d1", C, 8, 3, 2, 1),
        _torch_in(8, rng),
        t7.TorchObject("nn.ReLU", {}),
        res_block,
        t7.TorchObject("nn.SpatialUpSamplingNearest", {"scale_factor": 2}),
        _torch_in(8, rng),
        t7.TorchObject("nn.ReLU", {}),
        conv("c2", 8, 3, 3, 1, 1),
        t7.TorchObject("nn.Tanh", {}),
        t7.TorchObject("nn.MulConstant", {"constant_scalar": 150.0}),
        t7.TorchObject("nn.TotalVariation", {"strength": 1e-6}),
    ])
    return {"model": model, "opt": {"arch": "test"}}, convs


def test_import_stylizer_structure_and_weights(tmp_path, rng):
    ckpt, convs = _reference_style_checkpoint(rng)
    p = str(tmp_path / "m.t7")
    t7.save_t7(p, ckpt)
    spec, params = t7.import_stylizer(t7.load_t7(p))
    assert spec.in_channels == 7
    assert spec.padding_type == "reflect-start"
    assert spec.input_pad == 4
    assert spec.tanh_constant == 150.0
    kinds = [l.kind for l in spec.layers]
    assert kinds == ["conv", "conv", "res_block", "upsample", "conv"]
    assert spec.total_stride == 2
    # weight mapping: HWIO transpose of torch OIHW
    w = np.asarray(params["layer00"]["w"])
    np.testing.assert_allclose(
        w, np.transpose(convs["c1"][0], (2, 3, 1, 0)), atol=1e-6
    )
    # forward runs and respects shapes
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 7)), jnp.float32)
    y = stylizer.apply(params, spec, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.abs(np.asarray(y)).max() <= 150.0


def test_import_matches_equivalent_native_model(tmp_path, rng):
    """Placing identical weights into a natively-parsed spec must produce
    identical outputs — the importer's layer mapping is then verified
    numerically end-to-end."""
    ckpt, convs = _reference_style_checkpoint(rng)
    spec_imp, params_imp = t7.import_stylizer(ckpt)

    spec_nat = arch_dsl.parse_arch(
        "c3s1-4,d8,R8,U2,c3s1-3", in_channels=7, padding_type="reflect-start"
    )
    params_nat = stylizer.init_params(jax.random.PRNGKey(0), spec_nat)
    # graft imported weights into the native structure
    for name in params_imp:
        assert name in params_nat, name

    x = jnp.asarray(rng.normal(size=(2, 20, 20, 7)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        y_imp = np.asarray(stylizer.apply(params_imp, spec_imp, x))
        y_nat = np.asarray(stylizer.apply(params_imp, spec_nat, x))
    np.testing.assert_allclose(y_imp, y_nat, atol=1e-4)


def test_convert_model_file_roundtrip(tmp_path, rng):
    ckpt, _ = _reference_style_checkpoint(rng)
    t7_path = str(tmp_path / "m.t7")
    npz_path = str(tmp_path / "m.npz")
    t7.save_t7(t7_path, ckpt)
    t7.convert_model_file(t7_path, npz_path)
    spec, params, meta = checkpoint.load_model(npz_path)
    assert meta["imported_from"] == t7_path
    assert spec.input_pad == 4
    x = jnp.zeros((1, 16, 16, 7))
    y = stylizer.apply(params, spec, x)
    assert y.shape == (1, 16, 16, 3)


def test_import_vgg16(tmp_path, rng):
    mods = []
    torch_layout = [(3, 64), None, (64, 64), None, "pool"]
    for entry in torch_layout:
        if entry == "pool":
            mods.append(t7.TorchObject("nn.SpatialMaxPooling", {}))
        elif entry is None:
            mods.append(t7.TorchObject("nn.ReLU", {}))
        else:
            i, o = entry
            mods.append(_torch_conv(
                rng.normal(size=(o, i, 3, 3)).astype(np.float64),
                rng.normal(size=o).astype(np.float64), 3, 1, 1))
    p = str(tmp_path / "vgg.t7")
    t7.save_t7(p, _seq(mods))
    params = t7.import_vgg16(t7.load_t7(p))
    assert set(params) == {"conv01", "conv03"}
    assert params["conv01"]["w"].shape == (3, 3, 3, 64)
