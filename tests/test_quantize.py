"""Quantization ENCODERS (core/quantize.py) — the write direction.

gguf.py's decoders are pinned independently by tests/test_quant_fixtures.py
(hand-derived byte vectors), so a roundtrip through them is a meaningful
check of the encoders: any mis-packed bit or mis-mapped sub-block would
blow the reconstruction error far past the information-theoretic bound of
the format's bit width, which is what the bounds below are set at (+~30%).

Reference scope comparison: the reference's converter writes f16/f32 only
(scripts/convert.py) and delegates quantized file production to external
llama-quantize tooling; here the full reader-supported format family is
also writable (vision-cli quantize / vision-convert -q).
"""

import numpy as np
import pytest

from vision_tpu.core.errors import VispError
from vision_tpu.core.gguf import (
    _DEQUANTIZE,
    GGMLType,
    GGUFFile,
    GGUFWriter,
    requantize_gguf,
)
from vision_tpu.core.quantize import QUANTIZERS, block_size, quantize_blocks

# type -> relative-RMS bound on gaussian data (measured at the format's
# theoretical quantization floor, ~30% headroom; a layout bug reads ~1.0)
_RMS_BOUNDS = {
    GGMLType.Q4_0: 0.115,
    GGMLType.Q4_1: 0.105,
    GGMLType.Q5_0: 0.057,
    GGMLType.Q5_1: 0.051,
    GGMLType.Q8_0: 0.0072,
    GGMLType.Q2_K: 0.35,
    GGMLType.Q3_K: 0.20,
    GGMLType.Q4_K: 0.097,
    GGMLType.Q5_K: 0.049,
    GGMLType.Q6_K: 0.024,
    GGMLType.Q8_K: 0.0092,
    GGMLType.IQ4_NL: 0.10,
    GGMLType.IQ4_XS: 0.105,
}


def _rel_rms(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b**2)))


@pytest.mark.parametrize("fmt", sorted(QUANTIZERS, key=int), ids=lambda t: t.name)
def test_encode_roundtrip_rms(fmt):
    rng = np.random.default_rng(int(fmt))
    x = (rng.standard_normal(256 * 24) * 0.07).astype(np.float32)
    raw = quantize_blocks(fmt, x)
    dequant, blk, bpb = _DEQUANTIZE[fmt]
    assert blk == block_size(fmt)
    assert len(raw) == (x.size // blk) * bpb
    back = dequant(raw, x.size)
    assert _rel_rms(back, x) < _RMS_BOUNDS[fmt], fmt.name


def test_quality_ordering():
    """More bits must mean less error — catches a fit regression in any
    single format even when it stays under its absolute bound."""
    rng = np.random.default_rng(99)
    x = rng.standard_normal(256 * 32).astype(np.float32)
    rms = {}
    for fmt in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K):
        dequant = _DEQUANTIZE[fmt][0]
        rms[fmt] = _rel_rms(dequant(quantize_blocks(fmt, x), x.size), x)
    order = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K]
    for hi, lo in zip(order, order[1:]):
        assert rms[hi] > rms[lo], (hi.name, lo.name, rms)


@pytest.mark.parametrize("fmt", sorted(QUANTIZERS, key=int), ids=lambda t: t.name)
def test_encode_extremes_and_zeros(fmt):
    """All-zero blocks encode/decode to zeros (d=0 guard), and the block
    extreme must never clip badly (worst representable error is one step)."""
    blk = block_size(fmt)
    dequant = _DEQUANTIZE[fmt][0]
    z = np.zeros(blk * 3, np.float32)
    np.testing.assert_array_equal(dequant(quantize_blocks(fmt, z), z.size), z)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(blk * 5) * 0.05).astype(np.float32)
    x[::blk] = 3.0  # a spike per block
    back = dequant(quantize_blocks(fmt, x), x.size)
    # the spike survives within ~a quantization step of its block
    assert np.all(np.abs(back[::blk] - 3.0) < 3.0 * 0.6), fmt.name


def test_quantize_blocks_validates():
    with pytest.raises(VispError):
        quantize_blocks(GGMLType.Q4_K, np.zeros(100, np.float32))
    with pytest.raises(VispError):
        quantize_blocks(GGMLType.F16, np.zeros(256, np.float32))


def _tiny_gguf(path):
    w = GGUFWriter(path, "sam")
    w.add("sam.image_size", 64)
    rng = np.random.default_rng(3)
    w.add_tensor("big.weight", rng.standard_normal((8, 512)).astype(np.float32))
    w.add_tensor("ragged.weight", rng.standard_normal((6, 96)).astype(np.float32))
    w.add_tensor("bias", rng.standard_normal((17,)).astype(np.float32))
    w.add_tensor("index", np.arange(5, dtype=np.int32))
    w.write()
    return path


@pytest.mark.parametrize("ftype,kv,big,ragged", [
    ("q4_k", 14, GGMLType.Q4_K, GGMLType.Q8_0),   # 96 % 256 != 0 -> q8_0 ladder
    ("q6_k", 18, GGMLType.Q6_K, GGMLType.Q8_0),
    ("q5_0", 8, GGMLType.Q5_0, GGMLType.Q5_0),    # 96 % 32 == 0 -> direct
    ("q4_1", 3, GGMLType.Q4_1, GGMLType.Q4_1),
    ("iq4_nl", 25, GGMLType.IQ4_NL, GGMLType.IQ4_NL),  # 32-block, direct
    ("iq4_xs", 30, GGMLType.IQ4_XS, GGMLType.Q8_0),    # 256 super-block ladder
])
def test_requantize_gguf_new_types(tmp_path, ftype, kv, big, ragged):
    src = _tiny_gguf(tmp_path / "in.gguf")
    dst = tmp_path / f"out-{ftype}.gguf"
    requantize_gguf(src, dst, ftype)
    f = GGUFFile(dst)
    assert f.metadata["general.file_type"] == kv
    # the public float_type mirror (reference ml.h float_type()) must
    # report the written quant code, not fall back to F32
    assert f.float_type == big
    assert f.tensors["big.weight"].ggml_type == big
    assert f.tensors["ragged.weight"].ggml_type == ragged
    assert f.tensors["bias"].ggml_type == GGMLType.F32  # 1D keeps full precision
    assert f.tensors["index"].ggml_type == GGMLType.I32
    ref = GGUFFile(src)
    for name in ("big.weight", "ragged.weight"):
        a, b = ref.tensor(name), f.tensor(name)
        assert b.shape == a.shape
        assert _rel_rms(b.astype(np.float32), a) < 0.12
    np.testing.assert_array_equal(f.tensor("bias"), ref.tensor("bias"))


def test_requantize_stats_out(tmp_path):
    """stats_out collects (name, stored type, rel-RMS): quantized tensors
    get a positive bounded error, f32 fallbacks 0.0, integer tensors None."""
    src = _tiny_gguf(tmp_path / "in.gguf")
    stats = []
    requantize_gguf(src, tmp_path / "out.gguf", "q4_k", stats_out=stats)
    by_name = {n: (t, r) for n, t, r in stats}
    assert set(by_name) == {"big.weight", "ragged.weight", "bias", "index"}
    t, r = by_name["big.weight"]
    assert t == "Q4_K" and 0 < r < 0.12
    t, r = by_name["ragged.weight"]
    assert t == "Q8_0" and 0 < r < 0.01  # ladder fallback, still measured
    assert by_name["bias"] == ("F32", 0.0)
    assert by_name["index"] == ("I32", None)


def test_requantize_same_type_copies_blocks(tmp_path):
    """Requantizing at the stored type is a lossless block copy."""
    src = _tiny_gguf(tmp_path / "in.gguf")
    q1 = tmp_path / "q4k.gguf"
    requantize_gguf(src, q1, "q4_k")
    q2 = tmp_path / "q4k2.gguf"
    requantize_gguf(q1, q2, "q4_k")
    a, b = GGUFFile(q1), GGUFFile(q2)
    np.testing.assert_array_equal(a.raw("big.weight"), b.raw("big.weight"))


def test_converter_writer_k_quant(tmp_path):
    """convert.Writer threads non-q8_0 targets through the same ladder."""
    from vision_tpu.convert.convert import Writer

    rng = np.random.default_rng(5)
    w = Writer(tmp_path / "m.gguf", "sam", float_type="q6_k")
    w.set_layout_default("whcn")
    w.add_tensor("a.weight", rng.standard_normal((4, 256)).astype(np.float32))
    w.add_tensor("b.weight", rng.standard_normal((4, 64)).astype(np.float32))
    w.add_tensor("c.bias", rng.standard_normal((9,)).astype(np.float32))
    w.finish()
    f = GGUFFile(tmp_path / "m.gguf")
    assert f.metadata["general.file_type"] == 18
    assert f.tensors["a.weight"].ggml_type == GGMLType.Q6_K
    assert f.tensors["b.weight"].ggml_type == GGMLType.Q8_0
    assert f.tensors["c.bias"].ggml_type == GGMLType.F32
