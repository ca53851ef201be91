"""Quantized weight residency (core/quant.py) + Q8_0 writer support.

The TPU analog of ggml computing directly from quantized blocks
(reference depend on ggml-quants; model load keeps the file ggml_type,
src/visp/ml.cpp:283-360): int8 levels + per-block scales stay resident on
device and the dequant is traced into the graph at each Params access.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from vision_tpu.core.gguf import (
    GGMLType,
    GGUFWriter,
    dequantize_iq4_nl,
    dequantize_iq4_xs,
    dequantize_q4_0,
    dequantize_q4_1,
    dequantize_q5_0,
    dequantize_q5_1,
    dequantize_q8_0,
    model_load,
    quant_blocks,
    quantize_q8_0,
)
from vision_tpu.core.params import Params
from vision_tpu.core.quant import (
    is_quant,
    quantize_resident,
    quantize_store,
    store_nbytes,
)
from vision_tpu.core.weights import load_weights


def _f16_bytes(vals):
    return np.asarray(vals, np.float16).reshape(-1, 1).view(np.uint8)


def _raw_blocks(fmt, nb, rng):
    """Assemble valid random raw payloads per format."""
    d = _f16_bytes(rng.standard_normal(nb) * 0.1)
    m = _f16_bytes(rng.standard_normal(nb) * 0.05)
    qs16 = rng.integers(0, 256, (nb, 16), dtype=np.uint8)
    qh = rng.integers(0, 256, (nb, 4), dtype=np.uint8)
    q32 = rng.integers(-127, 128, (nb, 32)).astype(np.int8).view(np.uint8)
    if fmt == GGMLType.Q8_0:
        return np.concatenate([d, q32], axis=1).tobytes()
    if fmt == GGMLType.Q4_0:
        return np.concatenate([d, qs16], axis=1).tobytes()
    if fmt == GGMLType.Q4_1:
        return np.concatenate([d, m, qs16], axis=1).tobytes()
    if fmt == GGMLType.Q5_0:
        return np.concatenate([d, qh, qs16], axis=1).tobytes()
    if fmt == GGMLType.Q5_1:
        return np.concatenate([d, m, qh, qs16], axis=1).tobytes()
    if fmt == GGMLType.IQ4_NL:
        return np.concatenate([d, qs16], axis=1).tobytes()
    if fmt == GGMLType.IQ4_XS:
        sh = rng.integers(0, 256, (nb, 2), dtype=np.uint8)
        sl = rng.integers(0, 256, (nb, 4), dtype=np.uint8)
        qs128 = rng.integers(0, 256, (nb, 128), dtype=np.uint8)
        return np.concatenate([d, sh, sl, qs128], axis=1).tobytes()
    raise AssertionError(fmt)


@pytest.mark.parametrize(
    "fmt,dequant",
    [
        (GGMLType.Q8_0, dequantize_q8_0),
        (GGMLType.Q4_0, dequantize_q4_0),
        (GGMLType.Q4_1, dequantize_q4_1),
        (GGMLType.Q5_0, dequantize_q5_0),
        (GGMLType.Q5_1, dequantize_q5_1),
        (GGMLType.IQ4_NL, dequantize_iq4_nl),
        (GGMLType.IQ4_XS, dequantize_iq4_xs),
    ],
)
def test_quant_blocks_bit_exact(fmt, dequant):
    """q * scale (+ min) reproduces the float dequant bit-for-bit."""
    rng = np.random.default_rng(0)
    nb = 7
    raw = _raw_blocks(fmt, nb, rng)
    n = nb * (256 if fmt == GGMLType.IQ4_XS else 32)
    expected = dequant(raw, n)
    q, scale, minv = quant_blocks(fmt, raw, n)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    got = q.reshape(-1, 32).astype(np.float32) * scale[:, None]
    if minv is not None:
        got = got + minv[:, None]
    np.testing.assert_array_equal(got.reshape(-1), expected)


def test_quantize_q8_0_roundtrip():
    """Writer-side quantizer: error bounded by half a step; blocks decode."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    raw = quantize_q8_0(x)
    back = dequantize_q8_0(raw, x.size).reshape(x.shape)
    amax = np.abs(x.reshape(-1, 32)).max(axis=1)
    step = (amax / 127.0).reshape(8, 2).repeat(32, axis=1).reshape(8, 64)
    assert np.all(np.abs(back - x) <= step * 0.51 + 1e-8)


def test_resident_dequant_matches_expanded_load(tmp_path):
    """GGUF with Q8_0 tensors: keep_quantized dequant == expanded load,
    bit-exact, including the cwhn conv un-permute; resident bytes ~0.56x
    the bf16 footprint."""
    rng = np.random.default_rng(2)
    lin = rng.standard_normal((48, 64)).astype(np.float32)
    conv_ohwi = rng.standard_normal((16, 3, 3, 32)).astype(np.float32)  # cwhn-stored
    bias = rng.standard_normal((48,)).astype(np.float32)

    path = tmp_path / "q.gguf"
    w = GGUFWriter(path, "testarch")
    w.add("testarch.tensor_data_layout", "cwhn")
    w.add_raw_tensor("body.lin.weight", lin.shape, GGMLType.Q8_0, quantize_q8_0(lin))
    w.add_raw_tensor(
        "body.conv.weight", conv_ohwi.shape, GGMLType.Q8_0, quantize_q8_0(conv_ohwi)
    )
    w.add_tensor("body.lin.bias", bias)
    w.write()

    f = model_load(str(path))
    expanded = load_weights(f, device=None, float_dtype=np.float32)
    resident = load_weights(f, device=None, float_dtype=np.float32, keep_quantized=True)

    assert is_quant(resident["body.lin.weight"])
    r = resident["body.conv.weight"]
    assert is_quant(r) and r.permute == (0, 3, 1, 2)
    assert r.shape == (16, 32, 3, 3)  # torch-canonical view
    np.testing.assert_array_equal(
        np.asarray(r.dequant()), np.asarray(expanded["body.conv.weight"])
    )
    np.testing.assert_array_equal(
        np.asarray(resident["body.lin.weight"].dequant()),
        np.asarray(expanded["body.lin.weight"]),
    )
    # bias was stored float and stays an ordinary array
    assert not is_quant(resident["body.lin.bias"])
    n_q = resident["body.lin.weight"].nbytes + r.nbytes
    n_bf16 = 2 * (lin.size + conv_ohwi.size)
    assert n_q < 0.6 * n_bf16


def test_params_find_dequants_under_jit():
    rng = np.random.default_rng(3)
    wmat = rng.standard_normal((32, 64)).astype(np.float32)
    store = {"mlp.weight": quantize_resident(wmat, dtype="float32")}
    x = rng.standard_normal((4, 64)).astype(np.float32)

    @jax.jit
    def f(weights, x):
        return x @ Params(weights).weight("mlp.weight").T

    got = np.asarray(f(store, x))
    expected = x @ np.asarray(store["mlp.weight"].dequant()).T
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)
    # and the dequant is itself close to the original float weight
    assert float(np.abs(np.asarray(store["mlp.weight"].dequant()) - wmat).max()) < 0.02


def test_quantize_store_policy():
    rng = np.random.default_rng(4)
    store = {
        "big.weight": rng.standard_normal((64, 128)).astype(np.float32),
        "small.bias": rng.standard_normal((64,)).astype(np.float32),
        "positional_embedding": rng.standard_normal((64, 128)).astype(np.float32),
        "index.table": np.arange(4096, dtype=np.int32),
    }
    q = quantize_store(store, dtype="float32")
    assert is_quant(q["big.weight"])
    assert not is_quant(q["small.bias"])  # too small
    assert not is_quant(q["positional_embedding"])  # skip list
    assert not is_quant(q["index.table"])  # integer
    assert store_nbytes(q) < store_nbytes(store)


def test_quantize_store_bf16_device_arrays():
    """bf16 device arrays — the common case after a TPU load — must pass
    the floating-eligibility gate (np.issubdtype(bfloat16, floating) is
    False, so the gate needs the explicit name check; review r4c) and
    dequantize back within q8_0 error."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    store = {"big.weight": jnp.asarray(w, jnp.bfloat16)}
    q = quantize_store(store, dtype="float32")
    assert is_quant(q["big.weight"])
    back = np.asarray(q["big.weight"].dequant())
    # error vs the bf16-rounded source stays at the q8_0 floor
    src = np.asarray(store["big.weight"].astype(jnp.float32))
    assert float(np.abs(back - src).max()) < 0.05


def test_converter_q8_0_file(tmp_path):
    """convert.Writer with float_type=q8_0: eligible tensors quantize, the
    ragged/1D ones fall back to f32, file_type KV says MOSTLY_Q8_0."""
    from vision_tpu.convert.convert import Writer

    rng = np.random.default_rng(5)
    big = rng.standard_normal((24, 96)).astype(np.float32)
    ragged = rng.standard_normal((8, 5)).astype(np.float32)
    bias = rng.standard_normal((24,)).astype(np.float32)

    path = tmp_path / "conv.gguf"
    w = Writer(path, "testarch", "q8_0")
    w.add_tensor("a.weight", big)
    w.add_tensor("a.ragged", ragged)
    w.add_tensor("a.bias", bias)
    w.finish()

    f = model_load(str(path))
    assert f.metadata["general.file_type"] == 7
    assert f.is_quantized("a.weight")
    assert not f.is_quantized("a.ragged")
    assert not f.is_quantized("a.bias")
    got = f.tensor("a.weight")
    assert got.shape == big.shape
    assert float(np.abs(got - big).max()) < 0.05
    np.testing.assert_array_equal(f.tensor("a.ragged"), ragged)


@pytest.mark.slow
@pytest.mark.heavy
def test_sam_model_quantized_residency(tmp_path):
    """End-to-end: torch-twin sam checkpoint -> q8_0 GGUF ->
    sam_load_model(keep_quantized=True) -> mask parity vs the expanded
    load of the SAME file (bit-exact on CPU f32) + footprint halved."""
    import torch

    from test_roundtrip import build_sam_checkpoint, smooth_u8

    from vision_tpu.convert.convert import convert_model
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.image import image_load_array
    from vision_tpu.models.mobile_sam import sam_load_model

    ckpt_path = tmp_path / "sam.pth"
    build_sam_checkpoint(ckpt_path)
    gguf = convert_model("sam", ckpt_path, tmp_path / "sam-q8.gguf", float_type="q8_0")

    dev = backend_init(BackendType.cpu)
    m_res = sam_load_model(str(gguf), dev, keep_quantized=True)
    m_exp = sam_load_model(str(gguf), dev, keep_quantized=False)

    n_res = store_nbytes(m_res.params)
    n_exp = store_nbytes(m_exp.params)
    # quantized tensors shrink 4 -> ~1.125 B/elem; ragged/small/positional
    # tensors legitimately stay f32, so the whole-model ratio lands ~0.50
    assert n_res < 0.55 * n_exp, (n_res, n_exp)

    img = image_load_array(smooth_u8(200, 256))
    point = (128, 100)
    m_res.encode(img)
    mask_res = np.asarray(m_res.compute(point=point).data)
    m_exp.encode(img)
    mask_exp = np.asarray(m_exp.compute(point=point).data)
    # same quantized values, dequant moved host->graph: identical masks
    np.testing.assert_array_equal(mask_res, mask_exp)


def test_requantize_gguf_roundtrip(tmp_path, capsys):
    """f32 file -> q8_0 (KVs preserved, eligible tensors blocked, already-
    quantized payloads copied verbatim) -> back to f32; plus the CLI verb."""
    from vision_tpu.core.gguf import requantize_gguf

    rng = np.random.default_rng(7)
    big = rng.standard_normal((32, 64)).astype(np.float32)
    ragged = rng.standard_normal((6, 5)).astype(np.float32)
    idx = np.arange(128, dtype=np.int32)

    src = tmp_path / "m.gguf"
    w = GGUFWriter(src, "esrgan")
    w.add("esrgan.scale", 4)
    w.add("esrgan.tensor_data_layout", "whcn")
    w.add_tensor("body.w", big)
    w.add_tensor("body.ragged", ragged)
    w.add_tensor("body.idx", idx)
    w.write()

    q_path = requantize_gguf(src, tmp_path / "m-q8.gguf", "q8_0")
    q = model_load(str(q_path))
    assert q.metadata["general.file_type"] == 7
    assert q.metadata["esrgan.scale"] == 4
    assert q.metadata["esrgan.tensor_data_layout"] == "whcn"
    assert q.is_quantized("body.w") and not q.is_quantized("body.ragged")
    np.testing.assert_array_equal(q.tensor("body.idx"), idx)
    assert float(np.abs(q.tensor("body.w") - big).max()) < 0.05
    assert q_path.stat().st_size < src.stat().st_size

    # q8_0 -> q8_0 copies blocks bit-for-bit; -> f32 dequantizes
    q2 = model_load(str(requantize_gguf(q_path, tmp_path / "m-q8b.gguf", "q8_0")))
    np.testing.assert_array_equal(q2.raw("body.w"), q.raw("body.w"))
    f32 = model_load(str(requantize_gguf(q_path, tmp_path / "m-f32.gguf", "f32")))
    assert f32.metadata["general.file_type"] == 0
    np.testing.assert_array_equal(f32.tensor("body.w"), q.tensor("body.w"))

    # CLI verb (derived output name, no device init)
    from vision_tpu.cli import main

    rc = main(["quantize", "-m", str(src), "-o", str(tmp_path / "cli.gguf"), "--type", "q8_0"])
    assert rc == 0
    assert model_load(str(tmp_path / "cli.gguf")).is_quantized("body.w")


def test_requantize_k_quant_input(tmp_path):
    """vision-cli quantize accepts a K-quant source: Q4_K payloads expand
    and re-store as q8_0 within one quantization step of the K-quant
    values."""
    from test_gguf import _pack_q4_k

    from vision_tpu.core.gguf import (
        GGMLType,
        GGUFFile,
        GGUFWriter,
        dequantize_q4_k,
        requantize_gguf,
    )

    rng = np.random.default_rng(11)
    blocks = [
        _pack_q4_k(
            rng.uniform(0.01, 0.05),
            rng.uniform(0.01, 0.05),
            rng.integers(0, 64, 8).astype(np.uint8),
            rng.integers(0, 64, 8).astype(np.uint8),
            rng.integers(0, 16, 256).astype(np.uint8),
        )
        for _ in range(4)
    ]
    blob = np.concatenate(blocks).tobytes()
    src = tmp_path / "k.gguf"
    w = GGUFWriter(src, "esrgan")
    w.add("esrgan.scale", 4)
    w.add_raw_tensor("t.weight", (4, 256), GGMLType.Q4_K, blob)
    w.write()

    dst = requantize_gguf(src, tmp_path / "q8.gguf", "q8_0")
    g = GGUFFile(dst)
    assert g.tensors["t.weight"].ggml_type == GGMLType.Q8_0
    vals = dequantize_q4_k(blob, 4 * 256).reshape(4, 256)
    got = g.tensor("t.weight")
    v32 = vals.reshape(-1, 32)
    step = np.abs(v32).max(axis=1) / 127.0
    # half a quantization step + the f16 rounding of the per-block scale
    tol = step[:, None] * 0.51 + np.abs(v32) * 2.0**-10 + 1e-8
    assert np.all(np.abs(got.reshape(-1, 32) - v32) <= tol)


def test_resident_cwhn_honors_conv2d_weights_list(tmp_path):
    """A cwhn file carrying ``{arch}.conv2d_weights`` treats the list as
    authoritative for the RESIDENT path too (reference ml.cpp:435-445): a
    heuristic-matching tensor NOT in the list must load identically under
    keep_quantized True/False (review r4c — the modes used to disagree)."""
    rng = np.random.default_rng(5)
    conv = rng.standard_normal((16, 3, 3, 32)).astype(np.float32)  # listed
    fake = rng.standard_normal((8, 4, 4, 32)).astype(np.float32)  # conv-shaped, unlisted

    path = tmp_path / "c.gguf"
    w = GGUFWriter(path, "testarch")
    w.add("testarch.tensor_data_layout", "cwhn")
    w.add("testarch.conv2d_weights", [0])
    w.add_raw_tensor("conv.weight", conv.shape, GGMLType.Q8_0, quantize_q8_0(conv))
    w.add_raw_tensor("fake.weight", fake.shape, GGMLType.Q8_0, quantize_q8_0(fake))
    w.write()

    f = model_load(str(path))
    dense = load_weights(f, device=None, float_dtype=np.float32)
    res = load_weights(f, device=None, float_dtype=np.float32, keep_quantized=True)
    assert dense["conv.weight"].shape == res["conv.weight"].shape == (16, 32, 3, 3)
    assert dense["fake.weight"].shape == res["fake.weight"].shape == (8, 4, 4, 32)
    for k in ("conv.weight", "fake.weight"):
        np.testing.assert_array_equal(np.asarray(res[k].dequant()), dense[k])
