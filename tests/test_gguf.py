"""GGUF reader/writer round-trip tests (reference analogs: the GGUF loading
paths exercised by test-ml.cpp and the converter contract in SURVEY.md R3/R4)."""

import numpy as np
import pytest

from vision_tpu.core.gguf import (
    GGMLType,
    GGUFFile,
    GGUFWriter,
    bf16_to_f32,
    f32_to_bf16,
)
from vision_tpu.core.params import Params
from vision_tpu.core.weights import load_weights, unpermute_cwhn


def test_roundtrip_metadata_and_tensors(tmp_path, rng):
    path = tmp_path / "model.gguf"
    w = GGUFWriter(path, "esrgan")
    w.add("general.file_type", 0)
    w.add("esrgan.scale", 4)
    w.add("esrgan.block_count", 23)
    w.add("esrgan.tensor_data_layout", "whcn")
    w.add("esrgan.conv2d_weights", [0, 2])
    w.add("some.string", "hello world")
    w.add("some.float", 1.5)
    w.add("some.strings", ["a", "bb", "ccc"])
    t0 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    t1 = rng.standard_normal((16, 8)).astype(np.float32)
    t2 = rng.standard_normal((8, 1, 3, 3)).astype(np.float32)
    t3 = rng.integers(0, 100, (5, 2)).astype(np.int32)
    w.add_tensor("conv.weight", t0)
    w.add_tensor("linear.weight", t1)
    w.add_tensor("dw.weight", t2)
    w.add_tensor("idx", t3)
    w.write()

    f = GGUFFile(path)
    assert f.arch == "esrgan"
    assert f.get_int("esrgan.scale") == 4
    assert f.get_int("esrgan.block_count") == 23
    assert f.tensor_layout == "whcn"
    assert f.conv2d_weight_indices() == [0, 2]
    assert f.get_string("some.string") == "hello world"
    assert f.get_float("some.float") == 1.5
    assert f.get_array("some.strings") == ["a", "bb", "ccc"]
    np.testing.assert_array_equal(f.tensor("conv.weight"), t0)
    np.testing.assert_array_equal(f.tensor("linear.weight"), t1)
    np.testing.assert_array_equal(f.tensor("dw.weight"), t2)
    np.testing.assert_array_equal(f.tensor("idx"), t3)


def test_f16_storage(tmp_path, rng):
    path = tmp_path / "f16.gguf"
    w = GGUFWriter(path, "test")
    t = rng.standard_normal((4, 4)).astype(np.float32)
    w.add_tensor("t", t, GGMLType.F16)
    w.write()
    f = GGUFFile(path)
    assert f.tensors["t"].ggml_type == GGMLType.F16
    np.testing.assert_allclose(f.tensor("t", np.float32), t, atol=1e-3)


def test_bf16_storage(tmp_path, rng):
    path = tmp_path / "bf16.gguf"
    w = GGUFWriter(path, "test")
    t = rng.standard_normal((4, 4)).astype(np.float32)
    w.add_tensor("t", t, GGMLType.BF16)
    w.write()
    f = GGUFFile(path)
    np.testing.assert_allclose(f.tensor("t"), t, atol=0.02, rtol=0.01)


def test_bf16_conversion_exact():
    x = np.array([1.0, -2.5, 3.14159, 1e-20, 65504.0], np.float32)
    rt = bf16_to_f32(f32_to_bf16(x))
    np.testing.assert_allclose(rt, x, rtol=0.008)


def test_unpermute_cwhn():
    # normal conv stored (O,H,W,I) -> torch (O,I,H,W)
    a = np.arange(2 * 3 * 3 * 5, dtype=np.float32).reshape(2, 3, 3, 5)
    back = unpermute_cwhn("m.weight", a)
    assert back.shape == (2, 5, 3, 3)
    # depthwise stored (H,W,1,C) -> torch (C,1,H,W)
    d = np.arange(3 * 3 * 1 * 7, dtype=np.float32).reshape(3, 3, 1, 7)
    backd = unpermute_cwhn("m.weight", d)
    assert backd.shape == (7, 1, 3, 3)
    # non-conv 4D passes through
    nb = np.zeros((2, 5, 6, 9), np.float32)
    assert unpermute_cwhn("m.weight", nb).shape == (2, 5, 6, 9)


def test_conv2d_weights_list_overrides_kernel_heuristic(tmp_path, rng):
    """A tensor named by {arch}.conv2d_weights WAS permuted by the
    converter — the kernel-size heuristic must not veto the un-permute
    (a 5x5 conv would otherwise load mis-laid-out with no error), and an
    out-of-range list index must raise, not be silently dropped
    (reference ml.cpp:435-445 authority contract; review r4c)."""
    from vision_tpu.core.errors import VispError

    # exotic 5x5 kernel, outside _CONV_KERNEL_SIZES
    k5 = np.arange(2 * 5 * 5 * 3, dtype=np.float32).reshape(2, 5, 5, 3)
    assert unpermute_cwhn("m.weight", k5).shape == (2, 5, 5, 3)  # heuristic declines
    assert unpermute_cwhn("m.weight", k5, trusted=True).shape == (2, 3, 5, 5)
    d5 = np.zeros((5, 5, 1, 7), np.float32)
    assert unpermute_cwhn("m.weight", d5, trusted=True).shape == (7, 1, 5, 5)
    with pytest.raises(VispError, match="non-4D"):
        unpermute_cwhn("m.weight", np.zeros((3, 3), np.float32), trusted=True)

    # end-to-end: a cwhn file listing the 5x5 conv loads torch-canonical
    path = tmp_path / "c.gguf"
    w = GGUFWriter(path, "testarch")
    w.add("testarch.tensor_data_layout", "cwhn")
    w.add("testarch.conv2d_weights", [0])
    w.add_tensor("c.weight", k5)
    w.write()
    params = load_weights(GGUFFile(path), device=None, as_numpy=True)
    assert params["c.weight"].shape == (2, 3, 5, 5)

    bad = tmp_path / "bad.gguf"
    w = GGUFWriter(bad, "testarch")
    w.add("testarch.tensor_data_layout", "cwhn")
    w.add("testarch.conv2d_weights", [5])  # only 1 tensor in the file
    w.add_tensor("c.weight", k5)
    w.write()
    with pytest.raises(VispError, match="out of range"):
        load_weights(GGUFFile(bad), device=None, as_numpy=True)


def test_load_weights_layout_conversion(tmp_path, rng):
    """Type + layout conversion on transfer (reference test-ml.cpp:18-103)."""
    torch_kernel = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    # cwhn file: kernel pre-permuted by converter
    path = tmp_path / "cwhn.gguf"
    w = GGUFWriter(path, "test")
    w.add("test.tensor_data_layout", "cwhn")
    w.add_tensor("conv.weight", np.ascontiguousarray(torch_kernel.transpose(0, 2, 3, 1)))
    w.write()
    params = load_weights(GGUFFile(path), as_numpy=True)
    np.testing.assert_array_equal(params["conv.weight"], torch_kernel)

    # whcn file: kernel in torch layout already
    path2 = tmp_path / "whcn.gguf"
    w2 = GGUFWriter(path2, "test")
    w2.add("test.tensor_data_layout", "whcn")
    w2.add_tensor("conv.weight", torch_kernel, GGMLType.F16)
    w2.write()
    params2 = load_weights(GGUFFile(path2), as_numpy=True)
    np.testing.assert_allclose(params2["conv.weight"], torch_kernel, atol=1e-3)


def test_params_prefix_chaining():
    store = {
        "enc.blocks.0.attn.qkv.weight": 1,
        "enc.blocks.0.attn.qkv.bias": 2,
        "enc.blocks.1.attn.qkv.weight": 3,
        "dec.head.weight": 4,
    }
    p = Params(store)
    enc = p["enc"]
    b0 = enc["blocks"][0]
    assert b0["attn"]["qkv"].weight("weight") == 1
    assert b0["attn"]["qkv"].weight("bias") == 2
    assert enc["blocks"][1].weight("attn.qkv.weight") == 3
    assert p["dec"].find("head.weight") == 4
    assert p.find("missing") is None
    assert enc.child_count("blocks") == 2
    with pytest.raises(Exception):
        p.weight("nope")


def test_q8_0_dequantize(tmp_path):
    """Q8_0 quantized tensor reading (blocks of 32 int8 + f16 scale)."""
    import struct

    from vision_tpu.core.gguf import GGUF_MAGIC, dequantize_q8_0

    # hand-build two blocks
    scales = [0.5, 2.0]
    q = np.arange(-32, 32, dtype=np.int8)
    raw = b""
    for i, s in enumerate(scales):
        raw += np.float16(s).tobytes() + q[i * 32 : (i + 1) * 32].tobytes()
    out = dequantize_q8_0(raw, 64)
    expected = np.concatenate([q[:32].astype(np.float32) * 0.5, q[32:].astype(np.float32) * 2.0])
    np.testing.assert_allclose(out, expected)

    # full file round-trip: write a GGUF with a raw Q8_0 blob by hand
    path = tmp_path / "q8.gguf"
    with open(path, "wb") as f:
        f.write(GGUF_MAGIC)
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", 1, 1))
        key = b"general.architecture"
        f.write(struct.pack("<Q", len(key)) + key)
        f.write(struct.pack("<I", 8))  # STRING
        val = b"test"
        f.write(struct.pack("<Q", len(val)) + val)
        name = b"qt"
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 1))  # n_dims
        f.write(struct.pack("<Q", 64))  # ne[0]
        f.write(struct.pack("<I", 8))  # GGML_TYPE_Q8_0
        f.write(struct.pack("<Q", 0))  # offset
        pos = f.tell()
        f.write(b"\0" * ((-pos) % 32))
        f.write(raw)
    from vision_tpu.core.gguf import GGUFFile

    g = GGUFFile(path)
    np.testing.assert_allclose(g.tensor("qt"), expected)


def _f16_bytes(v: float) -> bytes:
    return np.float16(v).tobytes()


def _write_quant_tensor(tmp_path, ggml_type, block_bytes: bytes, n_elements=32):
    """Hand-assemble a GGUF with one pre-quantized tensor block."""
    from vision_tpu.core.gguf import GGUFWriter

    path = tmp_path / f"{ggml_type.name}.gguf"
    w = GGUFWriter(path, "esrgan")
    w.add_raw_tensor("t", (n_elements,), ggml_type, block_bytes)
    w.write()
    return path


def test_q4_0_dequantize(tmp_path):
    """One hand-built Q4_0 block: d=0.5, nibbles 0..15 twice in ggml order
    (element j = low nibble of byte j, element j+16 = high nibble)."""
    from vision_tpu.core.gguf import GGMLType, GGUFFile

    lo = np.arange(16, dtype=np.uint8)          # elements 0..15
    hi = np.arange(15, -1, -1, dtype=np.uint8)  # elements 16..31
    qs = (lo | (hi << 4)).tobytes()
    blk = _f16_bytes(0.5) + qs
    f = GGUFFile(_write_quant_tensor(tmp_path, GGMLType.Q4_0, blk))
    got = f.tensor("t")
    expected = np.concatenate([(lo.astype(np.float32) - 8), (hi.astype(np.float32) - 8)]) * 0.5
    np.testing.assert_allclose(got, expected)


def test_q4_1_dequantize(tmp_path):
    from vision_tpu.core.gguf import GGMLType, GGUFFile

    lo = np.arange(16, dtype=np.uint8)
    hi = np.full(16, 7, np.uint8)
    blk = _f16_bytes(0.25) + _f16_bytes(-1.5) + (lo | (hi << 4)).tobytes()
    f = GGUFFile(_write_quant_tensor(tmp_path, GGMLType.Q4_1, blk))
    expected = np.concatenate([lo, hi]).astype(np.float32) * 0.25 - 1.5
    np.testing.assert_allclose(f.tensor("t"), expected)


def test_q5_0_dequantize(tmp_path):
    """High bit i (little-endian u32) belongs to element i: q = qh<<4 | nib."""
    from vision_tpu.core.gguf import GGMLType, GGUFFile

    lo = np.arange(16, dtype=np.uint8)
    hi = np.arange(16, dtype=np.uint8)
    qh = np.uint32(0b1010 | (1 << 31)).tobytes()  # elements 1, 3 and 31 get +16
    blk = _f16_bytes(2.0) + qh + (lo | (hi << 4)).tobytes()
    f = GGUFFile(_write_quant_tensor(tmp_path, GGMLType.Q5_0, blk))
    q = np.concatenate([lo, hi]).astype(np.float32)
    q[1] += 16; q[3] += 16; q[31] += 16
    np.testing.assert_allclose(f.tensor("t"), (q - 16.0) * 2.0)


def test_q5_1_dequantize(tmp_path):
    from vision_tpu.core.gguf import GGMLType, GGUFFile

    lo = np.full(16, 3, np.uint8)
    hi = np.full(16, 12, np.uint8)
    qh = np.uint32(0xFFFF0000).tobytes()  # elements 16..31 get +16
    blk = _f16_bytes(0.5) + _f16_bytes(10.0) + qh + (lo | (hi << 4)).tobytes()
    f = GGUFFile(_write_quant_tensor(tmp_path, GGMLType.Q5_1, blk))
    q = np.concatenate([lo, hi]).astype(np.float32)
    q[16:] += 16
    np.testing.assert_allclose(f.tensor("t"), q * 0.5 + 10.0)


def test_unsupported_ggml_type_raises(tmp_path):
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.gguf import GGMLType, GGUFFile

    blk = b"\x00" * 36  # Q8_1 block: f16 d + f16 s + 32 int8
    f = GGUFFile(_write_quant_tensor(tmp_path, GGMLType.Q8_1, blk))
    with pytest.raises(VispError, match="Q8_1"):
        f.tensor("t")


# -- K-quants (ggml super-blocks of 256) -----------------------------------
# The packers below are written independently from the decoder, directly
# from the ggml-quants.c struct layouts, so the pair (pack here, dequant in
# core/gguf.py) cross-checks the format without a ggml binary.


def _pack_scale_min_k4(sc, mn):
    """8 (scale, min) 6-bit pairs -> the 12-byte ggml table."""
    out = np.zeros(12, np.uint8)
    for j in range(4):
        out[j] = (sc[j] & 63) | ((sc[j + 4] >> 4) << 6)
        out[j + 4] = (mn[j] & 63) | ((mn[j + 4] >> 4) << 6)
        out[j + 8] = (sc[j + 4] & 0x0F) | ((mn[j + 4] & 0x0F) << 4)
    return out


def _pack_q4_k(d, dmin, sc, mn, q):
    """One Q4_K super-block: q (256,) in [0,15], sub-block j = q[32j:32j+32]."""
    buf = np.zeros(144, np.uint8)
    buf[0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    buf[2:4] = np.frombuffer(np.float16(dmin).tobytes(), np.uint8)
    buf[4:16] = _pack_scale_min_k4(sc, mn)
    qs = np.zeros(128, np.uint8)
    for g in range(4):  # per 64-element group: low nibbles then high nibbles
        lo, hi = q[g * 64 : g * 64 + 32], q[g * 64 + 32 : g * 64 + 64]
        qs[g * 32 : (g + 1) * 32] = lo | (hi << 4)
    buf[16:] = qs
    return buf


def test_dequantize_q4_k():
    from vision_tpu.core.gguf import dequantize_q4_k

    rng = np.random.default_rng(3)
    blocks, expected = [], []
    for _ in range(3):
        d, dmin = rng.uniform(0.01, 0.1), rng.uniform(0.01, 0.1)
        sc = rng.integers(0, 64, 8).astype(np.uint8)
        mn = rng.integers(0, 64, 8).astype(np.uint8)
        q = rng.integers(0, 16, 256).astype(np.uint8)
        blocks.append(_pack_q4_k(d, dmin, sc, mn, q))
        d16, m16 = np.float32(np.float16(d)), np.float32(np.float16(dmin))
        for j in range(8):
            expected.extend(d16 * sc[j] * q[32 * j : 32 * j + 32] - m16 * mn[j])
    got = dequantize_q4_k(np.concatenate(blocks).tobytes(), 3 * 256)
    np.testing.assert_allclose(got, np.array(expected, np.float32), rtol=1e-6, atol=1e-7)


def test_dequantize_q5_k():
    from vision_tpu.core.gguf import dequantize_q5_k

    rng = np.random.default_rng(4)
    d, dmin = 0.03125, 0.0625  # exact in f16
    sc = rng.integers(0, 64, 8).astype(np.uint8)
    mn = rng.integers(0, 64, 8).astype(np.uint8)
    q = rng.integers(0, 32, 256).astype(np.uint8)  # 5-bit values
    buf = np.zeros(176, np.uint8)
    buf[0:2] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    buf[2:4] = np.frombuffer(np.float16(dmin).tobytes(), np.uint8)
    buf[4:16] = _pack_scale_min_k4(sc, mn)
    qh = np.zeros(32, np.uint8)
    qs = np.zeros(128, np.uint8)
    for j in range(8):  # sub-block j: bit j of qh[l] is the fifth bit
        sub = q[32 * j : 32 * j + 32]
        qh |= ((sub >> 4) & 1).astype(np.uint8) << j
        g, half = divmod(j, 2)
        if half == 0:
            qs[g * 32 : (g + 1) * 32] |= sub & 0x0F
        else:
            qs[g * 32 : (g + 1) * 32] |= (sub & 0x0F) << 4
    buf[16:48] = qh
    buf[48:] = qs
    expected = np.concatenate(
        [d * sc[j] * q[32 * j : 32 * j + 32] - dmin * mn[j] for j in range(8)]
    ).astype(np.float32)
    got = dequantize_q5_k(buf.tobytes(), 256)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_dequantize_q6_k():
    from vision_tpu.core.gguf import dequantize_q6_k

    rng = np.random.default_rng(5)
    d = 0.015625  # exact in f16
    scales = rng.integers(-128, 128, 16).astype(np.int8)
    q = rng.integers(0, 64, 256).astype(np.uint8)  # 6-bit values
    buf = np.zeros(210, np.uint8)
    ql = np.zeros(128, np.uint8)
    qh = np.zeros(64, np.uint8)
    for half in range(2):  # ggml half-block interleave (dequantize_row_q6_K)
        base = 128 * half
        for ll in range(32):
            v = [q[base + ll], q[base + 32 + ll], q[base + 64 + ll], q[base + 96 + ll]]
            ql[64 * half + ll] = (v[0] & 0x0F) | ((v[2] & 0x0F) << 4)
            ql[64 * half + 32 + ll] = (v[1] & 0x0F) | ((v[3] & 0x0F) << 4)
            qh[32 * half + ll] = (
                (v[0] >> 4) | ((v[1] >> 4) << 2) | ((v[2] >> 4) << 4) | ((v[3] >> 4) << 6)
            )
    buf[:128] = ql
    buf[128:192] = qh
    buf[192:208] = scales.view(np.uint8)
    buf[208:210] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    expected = np.concatenate(
        [
            d * float(scales[k]) * (q[16 * k : 16 * k + 16].astype(np.float32) - 32.0)
            for k in range(16)
        ]
    )
    got = dequantize_q6_k(buf.tobytes(), 256)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_k_quant_tensor_roundtrip(tmp_path):
    """A Q4_K tensor written with add_raw_tensor loads through the normal
    tensor() path (n_bytes honors the 256-element 144-byte blocks), and
    keep-quantized residency correctly declines it (expand-only)."""
    from vision_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter, dequantize_q4_k

    rng = np.random.default_rng(6)
    blocks = []
    for _ in range(4):  # (2, 512) tensor = 4 super-blocks
        blocks.append(
            _pack_q4_k(
                rng.uniform(0.01, 0.1),
                rng.uniform(0.01, 0.1),
                rng.integers(0, 64, 8).astype(np.uint8),
                rng.integers(0, 64, 8).astype(np.uint8),
                rng.integers(0, 16, 256).astype(np.uint8),
            )
        )
    blob = np.concatenate(blocks).tobytes()

    w = GGUFWriter(tmp_path / "k.gguf", "esrgan")
    w.add("esrgan.scale", 4)
    w.add_raw_tensor("t.weight", (2, 512), GGMLType.Q4_K, blob)
    w.write()

    f = GGUFFile(tmp_path / "k.gguf")
    assert f.tensors["t.weight"].ggml_type == GGMLType.Q4_K
    assert f.tensors["t.weight"].n_bytes == 4 * 144
    arr = f.tensor("t.weight")
    assert arr.shape == (2, 512) and arr.dtype == np.float32
    np.testing.assert_array_equal(arr.reshape(-1), dequantize_q4_k(blob, 1024))
    assert f.is_quantized("t.weight")
    assert f.tensor_quant_blocks("t.weight") is None  # K-quants expand at load


def test_dequantize_q2_k():
    from vision_tpu.core.gguf import dequantize_q2_k

    rng = np.random.default_rng(7)
    d, dmin = 0.25, 0.125  # exact in f16
    sc = rng.integers(0, 16, 16).astype(np.uint8)
    mn = rng.integers(0, 16, 16).astype(np.uint8)
    q = rng.integers(0, 4, 256).astype(np.uint8)
    buf = np.zeros(84, np.uint8)
    buf[:16] = sc | (mn << 4)
    qs = np.zeros(64, np.uint8)
    for half in range(2):  # q-byte l of a half packs bits (2j) of 4 sub-pairs
        for j in range(4):
            for l in range(32):
                qs[half * 32 + l] |= q[half * 128 + j * 32 + l] << (2 * j)
    buf[16:80] = qs
    buf[80:82] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    buf[82:84] = np.frombuffer(np.float16(dmin).tobytes(), np.uint8)
    expected = np.concatenate(
        [d * sc[s] * q[16 * s : 16 * s + 16].astype(np.float32) - dmin * mn[s] for s in range(16)]
    )
    got = dequantize_q2_k(buf.tobytes(), 256)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_dequantize_q3_k():
    from vision_tpu.core.gguf import dequantize_q3_k

    rng = np.random.default_rng(8)
    d = 0.0625  # exact in f16
    scales = rng.integers(0, 64, 16).astype(np.uint8)  # 6-bit, used as sc-32
    q = rng.integers(-4, 4, 256).astype(np.int8)  # signed 3-bit values
    # ggml element = (qs two-bit value) - (hmask bit ? 0 : 4): non-negative
    # values store v&3 with the bit SET, negatives store v+4 with it CLEAR
    qs = np.zeros(64, np.uint8)
    hmask = np.zeros(32, np.uint8)
    for half in range(2):
        for j in range(4):
            bit = half * 4 + j
            for l in range(32):
                v = int(q[half * 128 + j * 32 + l])
                if v >= 0:
                    hmask[l] |= 1 << bit
                    q2 = v
                else:
                    q2 = v + 4
                qs[half * 32 + l] |= q2 << (2 * j)
    buf = np.zeros(110, np.uint8)
    buf[:32] = hmask
    buf[32:96] = qs
    # pack 16 6-bit scales (kmask layout): low4 of scale s in byte s (s<8
    # low nibble, s>=8 high nibble of byte s-8); high2 in byte 8+s%4 shift 2*(s//4)
    sc12 = np.zeros(12, np.uint8)
    for s in range(16):
        lo4, hi2 = scales[s] & 0x0F, scales[s] >> 4
        if s < 8:
            sc12[s] |= lo4
        else:
            sc12[s - 8] |= lo4 << 4
        sc12[8 + s % 4] |= hi2 << (2 * (s // 4))
    buf[96:108] = sc12
    buf[108:110] = np.frombuffer(np.float16(d).tobytes(), np.uint8)
    expected = np.concatenate(
        [
            d * (float(scales[s]) - 32.0) * q[16 * s : 16 * s + 16].astype(np.float32)
            for s in range(16)
        ]
    )
    got = dequantize_q3_k(buf.tobytes(), 256)
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_malformed_files_raise_clean_errors(tmp_path):
    """Bad magic, empty, and truncated files -> VispError with a usable
    message, never a numpy shape error mid-load (reference ml.cpp throws
    visp::exception on malformed gguf)."""
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.gguf import GGUFFile, GGUFWriter

    bad = tmp_path / "bad.gguf"
    bad.write_bytes(b"XXXX" + b"\0" * 64)
    with pytest.raises(VispError, match="magic"):
        GGUFFile(bad)

    empty = tmp_path / "empty.gguf"
    empty.write_bytes(b"")
    with pytest.raises(VispError, match="magic"):
        GGUFFile(empty)

    ok = tmp_path / "ok.gguf"
    w = GGUFWriter(ok, "esrgan")
    w.add("esrgan.scale", 4)
    w.add_tensor("w", np.ones((64, 64), np.float32))
    w.write()
    trunc = tmp_path / "trunc.gguf"
    trunc.write_bytes(ok.read_bytes()[:-8192])
    with pytest.raises(VispError, match="truncated"):
        GGUFFile(trunc)


def test_unknown_tensor_type_opens_file(tmp_path):
    """A file containing a tensor of a type this reader doesn't support
    (e.g. an IQ format) still opens; only reading THAT tensor errors."""
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter

    w = GGUFWriter(tmp_path / "iq.gguf", "esrgan")
    w.add("esrgan.scale", 4)
    w.add_tensor("ok.weight", np.ones((8,), np.float32))
    w.add_raw_tensor("weird.weight", (256,), 19, b"\0" * 64)  # IQ2_XXS-ish
    w.write()

    f = GGUFFile(tmp_path / "iq.gguf")
    np.testing.assert_array_equal(f.tensor("ok.weight"), np.ones((8,), np.float32))
    with pytest.raises(VispError, match="unsupported"):
        f.tensor("weird.weight")


def test_bad_block_multiple_rejected(tmp_path):
    """A quantized tensor whose element count is not a block multiple is
    rejected at open (it could never decode to its declared shape)."""
    from vision_tpu.core.errors import VispError
    from vision_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter

    w = GGUFWriter(tmp_path / "b.gguf", "esrgan")
    w.add("esrgan.scale", 4)
    w.add_raw_tensor("t.weight", (2, 300), GGMLType.Q4_K, b"\0" * (2 * 144))
    w.write()
    with pytest.raises(VispError, match="multiple"):
        GGUFFile(tmp_path / "b.gguf")


def test_dequantize_q8_k():
    from vision_tpu.core.gguf import dequantize_q8_k

    rng = np.random.default_rng(9)
    d = 0.0123
    q = rng.integers(-128, 128, 256).astype(np.int8)
    buf = np.zeros(292, np.uint8)
    buf[0:4] = np.frombuffer(np.float32(d).tobytes(), np.uint8)
    buf[4:260] = q.view(np.uint8)
    sums = q.reshape(16, 16).sum(axis=1).astype(np.int16)  # bsums (unused on dequant)
    buf[260:292] = sums.view(np.uint8)
    got = dequantize_q8_k(buf.tobytes(), 256)
    np.testing.assert_allclose(got, np.float32(d) * q.astype(np.float32), rtol=1e-7)


def test_writer_honors_alignment_kv(tmp_path):
    """general.alignment in the KVs drives the writer's layout — copying a
    source file's alignment (requantize_gguf does) used to pad with 32
    while readers parsed back 64, shifting every tensor offset."""
    from vision_tpu.core.gguf import GGUFFile, GGUFWriter

    w = GGUFWriter(tmp_path / "a64.gguf", "esrgan")
    w.add("general.alignment", 64)
    w.add("esrgan.scale", 4)
    vals = np.arange(40, dtype=np.float32).reshape(5, 8)
    w.add_tensor("t.weight", vals)
    w.write()
    f = GGUFFile(tmp_path / "a64.gguf")
    assert f.alignment == 64 and f.data_offset % 64 == 0
    np.testing.assert_array_equal(f.tensor("t.weight"), vals)


def test_writer_numpy_and_bool_kvs(tmp_path):
    """numpy scalar/array metadata and bool arrays round-trip with correct
    element types (numpy ints are not `int`; bool subclasses int)."""
    from vision_tpu.core.gguf import GGUFFile, GGUFWriter

    w = GGUFWriter(tmp_path / "kv.gguf", "esrgan")
    w.add("x.ids", np.arange(3))
    w.add("x.floats", np.float32(1.5))
    w.add("x.flags", [True, False])
    w.add("x.np_int", np.int32(7))
    w.write()
    f = GGUFFile(tmp_path / "kv.gguf")
    assert f.get_array("x.ids") == [0, 1, 2]
    assert f.metadata["x.flags"] == [True, False]
    assert f.metadata["x.np_int"] == 7
    assert abs(f.metadata["x.floats"] - 1.5) < 1e-6


def test_metadata_only_file_opens(tmp_path):
    """A zero-tensor GGUF (vocab/config-only) opens without a data section."""
    from vision_tpu.core.gguf import GGUFFile, GGUFWriter

    w = GGUFWriter(tmp_path / "meta.gguf", "esrgan")
    w.add("esrgan.scale", 4)
    w.write()
    f = GGUFFile(tmp_path / "meta.gguf")
    assert f.get_int("esrgan.scale") == 4 and not f.tensors


def test_f32_to_bf16_nan_safe():
    """NaN payloads must stay NaN (the round-half-even carry used to
    overflow a NaN's exponent into +-0)."""
    from vision_tpu.core.gguf import bf16_to_f32, f32_to_bf16

    x = np.array([np.nan, -np.nan, 1.0, np.inf, -np.inf, 0.5], np.float32)
    back = bf16_to_f32(f32_to_bf16(x))
    assert np.isnan(back[0]) and np.isnan(back[1])
    np.testing.assert_array_equal(back[2:], x[2:])


def test_corrupt_header_sizes_raise_clean_errors(tmp_path):
    """Flipped bytes in u64 length/count fields (string length, array count,
    n_dims) -> clean VispError, never a ~2^50-byte allocation attempt
    (MemoryError/OOM); a zero or non-integer general.alignment errors
    cleanly instead of ZeroDivisionError (review r4c)."""
    import struct as st

    from vision_tpu.core.errors import VispError
    from vision_tpu.core.gguf import GGUFFile

    def s(x: str) -> bytes:
        b = x.encode()
        return st.pack("<Q", len(b)) + b

    hdr_kv = b"GGUF" + st.pack("<IQQ", 3, 0, 1)  # 0 tensors, 1 kv

    huge_str = tmp_path / "hs.gguf"
    huge_str.write_bytes(hdr_kv + st.pack("<Q", 1 << 50) + b"xx")
    with pytest.raises(VispError, match="corrupt"):
        GGUFFile(huge_str)

    huge_arr = tmp_path / "ha.gguf"  # ARRAY of STRING with count 2^50
    huge_arr.write_bytes(
        hdr_kv + s("a") + st.pack("<I", 9) + st.pack("<I", 8) + st.pack("<Q", 1 << 50)
    )
    with pytest.raises(VispError, match="corrupt"):
        GGUFFile(huge_arr)

    huge_counts = tmp_path / "hc.gguf"  # n_kv itself absurd
    huge_counts.write_bytes(b"GGUF" + st.pack("<IQQ", 3, 0, 1 << 50))
    with pytest.raises(VispError, match="corrupt"):
        GGUFFile(huge_counts)

    huge_dims = tmp_path / "hd.gguf"  # tensor claiming 2^30 dims
    huge_dims.write_bytes(b"GGUF" + st.pack("<IQQ", 3, 1, 0) + s("t") + st.pack("<I", 1 << 30))
    with pytest.raises(VispError, match="corrupt"):
        GGUFFile(huge_dims)

    zero_align = tmp_path / "za.gguf"  # general.alignment = 0 (u32)
    zero_align.write_bytes(hdr_kv + s("general.alignment") + st.pack("<II", 4, 0))
    with pytest.raises(VispError, match="alignment"):
        GGUFFile(zero_align)

    str_align = tmp_path / "sa.gguf"  # general.alignment = "x" (string)
    str_align.write_bytes(hdr_kv + s("general.alignment") + st.pack("<I", 8) + s("x"))
    with pytest.raises(VispError, match="alignment"):
        GGUFFile(str_align)


def test_add_raw_tensor_rejects_long_names(tmp_path):
    """add_raw_tensor enforces the same GGML_MAX_NAME gate as add_tensor —
    a quantized conversion must not silently write names the reference C++
    loader cannot represent (review r4c)."""
    from vision_tpu.core.errors import VispError

    w = GGUFWriter(tmp_path / "n.gguf", "esrgan")
    with pytest.raises(VispError, match="too long"):
        w.add_raw_tensor("x" * 64, (32,), GGMLType.Q8_0, b"\0" * 34)


def test_kv_type_fidelity_roundtrip(tmp_path):
    """Every GGUF-legal KV storage type survives read -> requantize ->
    read: f64 / u64 / i64 scalars keep their width (the writer's derived
    default would narrow them), nested arrays and f64 arrays round-trip,
    and the reader records storage types in kv_types (review r4c)."""
    from vision_tpu.core.gguf import GGUFValueType as VT
    from vision_tpu.core.gguf import requantize_gguf

    w = GGUFWriter(tmp_path / "src.gguf", "sam")
    w.add("sam.f64", 1.0 + 2**-40, vtype=(VT.FLOAT64, None))
    w.add("sam.u64", 2**63 + 7)                      # derived: UINT64
    w.add("sam.i64", -(2**40), vtype=(VT.INT64, None))
    w.add("sam.f64arr", [0.5, 1.0 + 2**-40], vtype=(VT.ARRAY, VT.FLOAT64))
    w.add("sam.nested", [[1, 2], [3]])               # derived: ARRAY of ARRAY
    w.add("sam.image_size", 64)
    w.add_tensor("t.weight", np.arange(64, dtype=np.float32).reshape(2, 32))
    w.write()

    f = GGUFFile(tmp_path / "src.gguf")
    assert f.metadata["sam.f64"] == 1.0 + 2**-40     # not narrowed to f32
    assert f.metadata["sam.u64"] == 2**63 + 7
    assert f.metadata["sam.nested"] == [[1, 2], [3]]
    assert f.kv_types["sam.f64"] == (VT.FLOAT64, None)
    assert f.kv_types["sam.u64"] == (VT.UINT64, None)
    assert f.kv_types["sam.f64arr"] == (VT.ARRAY, VT.FLOAT64)
    assert f.kv_types["sam.nested"] == (VT.ARRAY, VT.ARRAY)

    requantize_gguf(tmp_path / "src.gguf", tmp_path / "dst.gguf", "q8_0")
    g = GGUFFile(tmp_path / "dst.gguf")
    for k in ("sam.f64", "sam.u64", "sam.i64", "sam.f64arr", "sam.nested"):
        assert g.metadata[k] == f.metadata[k], k
        assert g.kv_types[k] == f.kv_types[k], k
