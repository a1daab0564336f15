"""Hand-authored Torch7 binary fixtures for the t7 reader.

Unlike tests/test_t7.py (round-trip through this repo's writer), every byte
stream here is built directly from the Torch7 serialization format — the
layout torch7's File.lua writeObject/readObject implements and that the
reference's pretrained checkpoints use (train_video.lua:523-541,
models/download_models.sh). This de-circularizes the reader tests: the
reader must parse bytes it never wrote, including the quirks a real
Torch-saved file can contain — legacy class-name headers (no "V 1"
version string), CudaTensor/CudaStorage types, heap back-references,
non-contiguous strides with storage offsets, and function records.
"""

import struct

import numpy as np
import pytest

from fast_artistic_videos_tpu.models import t7


class ByteWriter:
    """Torch7 record writer implemented straight from the format spec,
    deliberately independent of t7._Writer."""

    def __init__(self):
        self.buf = bytearray()
        self.next_index = 1

    def i32(self, v):
        self.buf += struct.pack("<i", v)

    def i64(self, v):
        self.buf += struct.pack("<q", v)

    def f64(self, v):
        self.buf += struct.pack("<d", v)

    def raw_string(self, s):
        b = s.encode()
        self.i32(len(b))
        self.buf += b

    def nil(self):
        self.i32(0)

    def number(self, v):
        self.i32(1)
        self.f64(v)

    def string(self, s):
        self.i32(2)
        self.raw_string(s)

    def boolean(self, v):
        self.i32(5)
        self.i32(1 if v else 0)

    def begin_table(self, count):
        """Returns the heap index assigned to this table."""
        self.i32(3)
        idx = self.next_index
        self.next_index += 1
        self.i32(idx)
        self.i32(count)
        return idx

    def backref_table(self, idx):
        self.i32(3)
        self.i32(idx)

    def begin_torch(self, classname, legacy=False, version=1):
        self.i32(4)
        idx = self.next_index
        self.next_index += 1
        self.i32(idx)
        if legacy:
            # pre-versioning files: the "version string" IS the class name
            self.raw_string(classname)
        else:
            self.raw_string(f"V {version}")
            self.raw_string(classname)
        return idx

    def backref_torch(self, idx):
        self.i32(4)
        self.i32(idx)

    def storage(self, arr, classname, legacy=False):
        self.begin_torch(classname, legacy=legacy)
        self.i64(arr.size)
        self.buf += arr.tobytes()

    def tensor(self, arr, classname, storage_cls, legacy=False,
               stride=None, offset=1, storage=None):
        """Write a tensor header + inline storage record. `storage` lets a
        caller pass a larger backing array (offset/stride views)."""
        self.begin_torch(classname, legacy=legacy)
        self.i32(arr.ndim)
        self.buf += np.asarray(arr.shape, np.int64).tobytes()
        if stride is None:
            stride = [s // arr.dtype.itemsize for s in arr.strides]
        self.buf += np.asarray(stride, np.int64).tobytes()
        self.i64(offset)
        self.storage(storage if storage is not None else np.ascontiguousarray(arr),
                     storage_cls, legacy=legacy)

    def function(self, dump=b"\x1bLJ fake bytecode", recur=False, legacy_recur=False):
        if recur or legacy_recur:
            self.i32(7 if legacy_recur else 8)
            idx = self.next_index
            self.next_index += 1
            self.i32(idx)
        else:
            self.i32(6)
        self.i32(len(dump))
        self.buf += dump
        self.nil()  # upvalue record


def parse(w: ByteWriter):
    return t7._Reader(bytes(w.buf)).read_object()


def test_scalars():
    for build, expect in [
        (lambda w: w.nil(), None),
        (lambda w: w.number(3.5), 3.5),
        (lambda w: w.number(7.0), 7),
        (lambda w: w.string("hëllo"), "hëllo"),
        (lambda w: w.boolean(True), True),
        (lambda w: w.boolean(False), False),
    ]:
        w = ByteWriter()
        build(w)
        assert parse(w) == expect


def test_versioned_float_tensor():
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    w = ByteWriter()
    w.tensor(data, "torch.FloatTensor", "torch.FloatStorage")
    out = parse(w)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data)


def test_legacy_classname_header_tensor():
    """Pre-V1 files write the raw class name where newer files write 'V 1'."""
    data = np.arange(6, dtype=np.float64).reshape(2, 3)
    w = ByteWriter()
    w.tensor(data, "torch.DoubleTensor", "torch.DoubleStorage", legacy=True)
    out = parse(w)
    assert out.dtype == np.float64
    np.testing.assert_array_equal(out, data)


def test_cuda_tensor_storage():
    """GPU-saved checkpoints contain torch.CudaTensor/CudaStorage; the
    elements are float32 on disk."""
    data = np.linspace(-1, 1, 8, dtype=np.float32).reshape(2, 4)
    w = ByteWriter()
    w.tensor(data, "torch.CudaTensor", "torch.CudaStorage")
    out = parse(w)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data)


def test_strided_view_with_storage_offset():
    """A transposed/offset tensor view: shape (2,3), stride (1,4), offset 3
    (1-based) into a 16-element storage — the reader must honor all three."""
    backing = np.arange(16, dtype=np.float32)
    w = ByteWriter()
    shaped = np.empty((2, 3), np.float32)  # only shape/dtype matter here
    w.tensor(shaped, "torch.FloatTensor", "torch.FloatStorage",
             stride=[1, 4], offset=3, storage=backing)
    out = parse(w)
    # element (i, j) = storage[(3-1) + i*1 + j*4]
    expect = np.array([[2, 6, 10], [3, 7, 11]], np.float32)
    np.testing.assert_array_equal(out, expect)


def test_int_byte_tensors():
    for cls, dt in [("torch.LongTensor", np.int64), ("torch.IntTensor", np.int32),
                    ("torch.ByteTensor", np.uint8), ("torch.ShortTensor", np.int16)]:
        data = np.arange(5).astype(dt)
        w = ByteWriter()
        w.tensor(data, cls, cls.replace("Tensor", "Storage"))
        out = parse(w)
        assert out.dtype == dt
        np.testing.assert_array_equal(out, data)


def test_table_with_mixed_keys():
    w = ByteWriter()
    w.begin_table(3)
    w.string("alpha"); w.number(1.0)
    w.number(1.0); w.string("one")           # lua array-style key
    w.string("flag"); w.boolean(True)
    out = parse(w)
    assert out == {"alpha": 1, 1: "one", "flag": True}


def test_table_backreference_identity():
    """The same table written twice: second occurrence is index-only."""
    w = ByteWriter()
    w.begin_table(2)
    w.string("a")
    inner_idx = w.begin_table(1)
    w.string("x"); w.number(42.0)
    w.string("b")
    w.backref_table(inner_idx)
    out = parse(w)
    assert out["a"] is out["b"]
    assert out["a"] == {"x": 42}


def test_tensor_backreference():
    """Shared weights: one tensor object referenced from two table slots."""
    data = np.ones((2, 2), np.float32)
    w = ByteWriter()
    w.begin_table(2)
    w.string("w1")
    # capture the heap index the tensor will get
    idx = w.next_index
    w.tensor(data, "torch.FloatTensor", "torch.FloatStorage")
    w.string("w2")
    w.backref_torch(idx)
    out = parse(w)
    assert out["w1"] is out["w2"]
    np.testing.assert_array_equal(out["w1"], data)


def test_nn_module_object():
    """An nn-module-style object: class header + attribute table payload."""
    weight = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    w = ByteWriter()
    w.begin_torch("nn.Linear")
    w.begin_table(2)
    w.string("weight")
    w.tensor(weight, "torch.FloatTensor", "torch.FloatStorage")
    w.string("train"); w.boolean(False)
    out = parse(w)
    assert isinstance(out, t7.TorchObject)
    assert out.torch_typename == "nn.Linear"
    np.testing.assert_array_equal(out["weight"], weight)
    assert out["train"] is False


def test_function_records_skipped():
    """Plain (6) and recursive (7/8) function records; 7/8 carry a heap
    index that must be consumed or everything after desynchronizes."""
    for kwargs in [dict(), dict(recur=True), dict(legacy_recur=True)]:
        w = ByteWriter()
        w.begin_table(2)
        w.string("f")
        w.function(**kwargs)
        w.string("after"); w.number(99.0)
        out = parse(w)
        assert out == {"f": None, "after": 99}


def test_truncated_file_raises():
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    w = ByteWriter()
    w.tensor(data, "torch.FloatTensor", "torch.FloatStorage")
    with pytest.raises(ValueError, match="truncated"):
        t7._Reader(bytes(w.buf[:-8])).read_object()


def test_unknown_record_type_raises():
    w = ByteWriter()
    w.i32(11)
    with pytest.raises(ValueError, match="unknown t7 record type"):
        parse(w)


def _write_conv(w, cin, cout, k, stride, pad, rng, legacy, flat_weight=False):
    """nn.SpatialConvolution with the attrs the reference builder sets."""
    weight = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)
    w.begin_torch("nn.SpatialConvolution", legacy=legacy)
    attrs = [
        ("nInputPlane", cin), ("nOutputPlane", cout), ("kW", k), ("kH", k),
        ("dW", stride), ("dH", stride), ("padW", pad), ("padH", pad),
    ]
    w.begin_table(len(attrs) + 2)
    for key, val in attrs:
        w.string(key); w.number(float(val))
    w.string("weight")
    wdata = weight.reshape(cout, -1) if flat_weight else weight
    w.tensor(wdata, "torch.FloatTensor", "torch.FloatStorage", legacy=legacy)
    w.string("bias")
    w.tensor(bias, "torch.FloatTensor", "torch.FloatStorage", legacy=legacy)
    return weight, bias


def _write_instance_norm(w, c, rng, legacy):
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    w.begin_torch("nn.InstanceNormalization", legacy=legacy)
    w.begin_table(3)
    w.string("nOutput"); w.number(float(c))
    w.string("weight")
    w.tensor(scale, "torch.FloatTensor", "torch.FloatStorage", legacy=legacy)
    w.string("bias")
    w.tensor(bias, "torch.FloatTensor", "torch.FloatStorage", legacy=legacy)
    return scale, bias


def _write_simple(w, classname, attrs, legacy=False):
    w.begin_torch(classname, legacy=legacy)
    w.begin_table(len(attrs))
    for key, val in attrs.items():
        w.string(key)
        if isinstance(val, bool):
            w.boolean(val)
        else:
            w.number(float(val))


@pytest.mark.parametrize("legacy", [False, True])
def test_import_stylizer_from_raw_bytes(legacy):
    """A hand-serialized {model=nn.Sequential} checkpoint in the exact shape
    train_video.lua:523-541 saves (conv -> IN -> ReLU -> conv -> Tanh ->
    MulConstant -> TotalVariation), parsed end-to-end by import_stylizer."""
    rng = np.random.default_rng(7)
    w = ByteWriter()
    w.begin_table(2)
    w.string("model")
    w.begin_torch("nn.Sequential", legacy=legacy)
    w.begin_table(1)
    w.string("modules")
    w.begin_table(6)
    mods = []

    def slot(builder):
        mods.append(None)
        w.number(float(len(mods)))
        return builder()

    w1, b1 = slot(lambda: _write_conv(w, 7, 8, 3, 1, 1, rng, legacy))
    s1, n1 = slot(lambda: _write_instance_norm(w, 8, rng, legacy))
    slot(lambda: _write_simple(w, "nn.ReLU", {"inplace": True}, legacy))
    w2, b2 = slot(lambda: _write_conv(w, 8, 3, 3, 1, 1, rng, legacy,
                                      flat_weight=True))
    slot(lambda: _write_simple(w, "nn.Tanh", {}, legacy))
    slot(lambda: _write_simple(w, "nn.MulConstant", {"constant_scalar": 150.0},
                               legacy))
    w.string("opt")
    w.begin_table(1)
    w.string("arch"); w.string("test")

    obj = parse(w)
    spec, params = t7.import_stylizer(obj)
    assert spec.in_channels == 7
    assert spec.tanh_constant == 150.0
    assert [l.kind for l in spec.layers] == ["conv", "conv"]
    assert spec.layers[0].norm_after and spec.layers[0].relu_after
    # conv weights land as HWIO
    np.testing.assert_allclose(
        np.asarray(params["layer00"]["w"]), np.transpose(w1, (2, 3, 1, 0)),
        rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer00"]["b"]), b1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layer00_norm"]["scale"]), s1,
                               rtol=1e-6)
    # the flattened (O, I*kH*kW) weight form is un-flattened on import
    np.testing.assert_allclose(
        np.asarray(params["layer01"]["w"]), np.transpose(w2, (2, 3, 1, 0)),
        rtol=1e-6)


def test_import_stylizer_unknown_module_raises():
    """Constructs the importer can't map must fail loudly, not silently skip."""
    w = ByteWriter()
    w.begin_torch("nn.Sequential")
    w.begin_table(1)
    w.string("modules")
    w.begin_table(1)
    w.number(1.0)
    _write_simple(w, "nn.SpatialDilatedConvolution", {"nInputPlane": 3})
    obj = parse(w)
    with pytest.raises(ValueError, match="unsupported module"):
        t7.import_stylizer(obj)
