"""Generate independent dequantization fixtures (VERDICT r3 missing #3).

``tests/test_quant.py`` proves quantize->dequantize self-consistency — the
code against itself. This script de-circularizes that: it freezes
(raw bytes, expected floats) vectors for every supported ggml quant type
into ``tests/fixtures/quant_vectors.npz``, where the expected floats are
produced by the SCALAR REFERENCE LOOPS below — written element-by-element
from the public ggml quant format spec (ggml-quants.c dequantize_row_*
semantics, block layouts as documented in the GGUF spec), sharing no code
with ``vision_tpu.core.gguf``. A mis-read of a bit layout in the vectorized
numpy decoders cannot reproduce here by construction.

The reference framework consumes these exact byte layouts through ggml in
model_transfer (reference src/visp/ml.cpp:283-360).

Run: python scripts/make_quant_fixtures.py   (writes the .npz; idempotent)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np


def f16(lo: int, hi: int) -> float:
    """Decode little-endian fp16 from two bytes."""
    return float(np.frombuffer(bytes([lo, hi]), np.float16)[0])


# ---------------------------------------------------------------------------
# Scalar reference decoders: one float at a time, straight from the spec.
# Layout notation: all blocks little-endian, no padding.
# ---------------------------------------------------------------------------


def ref_q8_0(raw: bytes, n: int) -> np.ndarray:
    """34-byte block = fp16 d + 32 x int8; y = d * q."""
    out = []
    for i in range(n // 32):
        b = raw[i * 34 : (i + 1) * 34]
        d = f16(b[0], b[1])
        for j in range(32):
            q = struct.unpack("b", b[2 + j : 3 + j])[0]
            out.append(d * q)
    return np.asarray(out, np.float32)


def ref_q4_0(raw: bytes, n: int) -> np.ndarray:
    """18-byte block = fp16 d + 16 nibble bytes; byte j holds element j in
    its low nibble and element j+16 in its high nibble; y = d * (q - 8)."""
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 18 : (i + 1) * 18]
        d = f16(b[0], b[1])
        for j in range(16):
            out[i * 32 + j] = d * ((b[2 + j] & 0x0F) - 8)
            out[i * 32 + j + 16] = d * ((b[2 + j] >> 4) - 8)
    return out


def ref_q4_1(raw: bytes, n: int) -> np.ndarray:
    """20-byte block = fp16 d + fp16 m + 16 nibble bytes; y = d * q + m."""
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 20 : (i + 1) * 20]
        d, m = f16(b[0], b[1]), f16(b[2], b[3])
        for j in range(16):
            out[i * 32 + j] = d * (b[4 + j] & 0x0F) + m
            out[i * 32 + j + 16] = d * (b[4 + j] >> 4) + m
    return out


def ref_q5_0(raw: bytes, n: int) -> np.ndarray:
    """22-byte block = fp16 d + u32 qh + 16 nibble bytes; element j's fifth
    bit is bit j of qh; y = d * (q - 16)."""
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 22 : (i + 1) * 22]
        d = f16(b[0], b[1])
        (qh,) = struct.unpack("<I", b[2:6])
        for j in range(16):
            x0 = (b[6 + j] & 0x0F) | (((qh >> j) & 1) << 4)
            x1 = (b[6 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4)
            out[i * 32 + j] = d * (x0 - 16)
            out[i * 32 + j + 16] = d * (x1 - 16)
    return out


def ref_q5_1(raw: bytes, n: int) -> np.ndarray:
    """24-byte block = fp16 d + fp16 m + u32 qh + 16 nibble bytes;
    y = d * q + m."""
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 24 : (i + 1) * 24]
        d, m = f16(b[0], b[1]), f16(b[2], b[3])
        (qh,) = struct.unpack("<I", b[4:8])
        for j in range(16):
            x0 = (b[8 + j] & 0x0F) | (((qh >> j) & 1) << 4)
            x1 = (b[8 + j] >> 4) | (((qh >> (j + 16)) & 1) << 4)
            out[i * 32 + j] = d * x0 + m
            out[i * 32 + j + 16] = d * x1 + m
    return out


def _scale_min_k4(js: int, sm: bytes) -> tuple[int, int]:
    """6-bit (scale, min) pair js of the 12-byte Q4_K/Q5_K table: pairs 0-3
    sit in the low 6 bits of bytes js / js+4; pairs 4-7 take their low 4
    bits from the nibbles of byte js+4 and their high 2 bits from the top
    of bytes js-4 / js."""
    if js < 4:
        return sm[js] & 63, sm[js + 4] & 63
    sc = (sm[js + 4] & 0x0F) | ((sm[js - 4] >> 6) << 4)
    mn = (sm[js + 4] >> 4) | ((sm[js] >> 6) << 4)
    return sc, mn


def ref_q4_k(raw: bytes, n: int) -> np.ndarray:
    """144-byte superblock of 256 = fp16 d + fp16 dmin + 12-byte scale table
    + 128 nibble bytes. Four 32-byte quant groups; group g's low nibbles are
    sub-block 2g (scale pair 2g), high nibbles sub-block 2g+1;
    y = d*sc*q - dmin*mn."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 144 : (i + 1) * 144]
        d, dmin = f16(b[0], b[1]), f16(b[2], b[3])
        sm = b[4:16]
        for g in range(4):
            q = b[16 + 32 * g : 16 + 32 * (g + 1)]
            sc0, mn0 = _scale_min_k4(2 * g, sm)
            sc1, mn1 = _scale_min_k4(2 * g + 1, sm)
            for l in range(32):
                out[i * 256 + 64 * g + l] = d * sc0 * (q[l] & 0x0F) - dmin * mn0
                out[i * 256 + 64 * g + 32 + l] = d * sc1 * (q[l] >> 4) - dmin * mn1
    return out


def ref_q5_k(raw: bytes, n: int) -> np.ndarray:
    """176-byte superblock = Q4_K header/table + 32 high-bit bytes + 128
    nibble bytes; sub-block s's fifth bit for element l is bit s of qh[l]."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 176 : (i + 1) * 176]
        d, dmin = f16(b[0], b[1]), f16(b[2], b[3])
        sm = b[4:16]
        qh = b[16:48]
        for g in range(4):
            q = b[48 + 32 * g : 48 + 32 * (g + 1)]
            sc0, mn0 = _scale_min_k4(2 * g, sm)
            sc1, mn1 = _scale_min_k4(2 * g + 1, sm)
            for l in range(32):
                x0 = (q[l] & 0x0F) + (16 if (qh[l] >> (2 * g)) & 1 else 0)
                x1 = (q[l] >> 4) + (16 if (qh[l] >> (2 * g + 1)) & 1 else 0)
                out[i * 256 + 64 * g + l] = d * sc0 * x0 - dmin * mn0
                out[i * 256 + 64 * g + 32 + l] = d * sc1 * x1 - dmin * mn1
    return out


def ref_q2_k(raw: bytes, n: int) -> np.ndarray:
    """84-byte superblock = 16 scale bytes (low nibble scale, high nibble
    min) + 64 two-bit bytes + fp16 d + fp16 dmin. Quants: per 32-byte half
    h, shift s in (0,2,4,6) yields sub-blocks h*8 + s/2*2 + {0,1} from bytes
    0-15 / 16-31; y = d*sc*q - dmin*mn."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 84 : (i + 1) * 84]
        scales = b[:16]
        d, dmin = f16(b[80], b[81]), f16(b[82], b[83])
        idx = i * 256
        js = 0
        for h in range(2):
            q = b[16 + 32 * h : 16 + 32 * (h + 1)]
            for shift in (0, 2, 4, 6):
                for part in range(2):  # bytes 0-15 then 16-31
                    sc = scales[js] & 0x0F
                    mn = scales[js] >> 4
                    js += 1
                    for l in range(16):
                        qv = (q[16 * part + l] >> shift) & 3
                        out[idx] = d * sc * qv - dmin * mn
                        idx += 1
    return out


def ref_q3_k(raw: bytes, n: int) -> np.ndarray:
    """110-byte superblock = 32 hmask bytes + 64 two-bit bytes + 12 packed
    6-bit scale bytes + fp16 d. Scale s: low 4 bits from byte s (s<8, low
    nibble) or byte s-8 (s>=8, high nibble), high 2 bits from byte 8+s%4 at
    shift 2*(s//4); value (6-bit) - 32. Quant: like Q2_K but an UNSET high
    bit (bit s//2 of hmask byte (s%2)*16+l) subtracts 4; y = d*sc*q."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 110 : (i + 1) * 110]
        hmask = b[:32]
        sc12 = b[96:108]
        d = f16(b[108], b[109])

        def scale(s: int) -> int:
            lo = (sc12[s] & 0x0F) if s < 8 else (sc12[s - 8] >> 4)
            hi = (sc12[8 + s % 4] >> (2 * (s // 4))) & 3
            return (lo | (hi << 4)) - 32

        idx = i * 256
        js = 0
        for h in range(2):
            q = b[32 + 32 * h : 32 + 32 * (h + 1)]
            for shift in (0, 2, 4, 6):
                for part in range(2):
                    sc = scale(js)
                    for l in range(16):
                        qv = (q[16 * part + l] >> shift) & 3
                        if not (hmask[16 * part + l] >> (js // 2)) & 1:
                            qv -= 4
                        out[idx] = d * sc * qv
                        idx += 1
                    js += 1
    return out


def ref_q6_k(raw: bytes, n: int) -> np.ndarray:
    """210-byte superblock = 128 low-nibble bytes + 64 two-bit-high bytes +
    16 int8 scales + fp16 d. Per 128-element half: element l of quarter k
    (offsets 0/32/64/96) combines ql/qh as below, scale index l//16 + 2k;
    y = d * sc * (q - 32)."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 210 : (i + 1) * 210]
        sc = struct.unpack("16b", b[192:208])
        d = f16(b[208], b[209])
        for h in range(2):
            ql = b[64 * h : 64 * (h + 1)]
            qh = b[128 + 32 * h : 128 + 32 * (h + 1)]
            for l in range(32):
                q1 = (ql[l] & 0x0F) | (((qh[l] >> 0) & 3) << 4)
                q2 = (ql[l + 32] & 0x0F) | (((qh[l] >> 2) & 3) << 4)
                q3 = (ql[l] >> 4) | (((qh[l] >> 4) & 3) << 4)
                q4 = (ql[l + 32] >> 4) | (((qh[l] >> 6) & 3) << 4)
                base = i * 256 + 128 * h
                s = 8 * h + l // 16
                out[base + l] = d * sc[s] * (q1 - 32)
                out[base + 32 + l] = d * sc[s + 2] * (q2 - 32)
                out[base + 64 + l] = d * sc[s + 4] * (q3 - 32)
                out[base + 96 + l] = d * sc[s + 6] * (q4 - 32)
    return out


def ref_q8_k(raw: bytes, n: int) -> np.ndarray:
    """292-byte superblock = f32 d + 256 int8 + 16 int16 bsums (dequant
    ignores the bsums); y = d * q."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 292 : (i + 1) * 292]
        (d,) = struct.unpack("<f", b[0:4])
        q = struct.unpack("256b", b[4:260])
        for l in range(256):
            out[i * 256 + l] = d * q[l]
    return out


# The public non-linear 4-bit grid (ggml kvalues_iq4nl), written out here
# independently of vision_tpu.core.gguf._IQ4_KVALUES.
KVALUES_IQ4NL = [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113]


def ref_iq4_nl(raw: bytes, n: int) -> np.ndarray:
    """18-byte block = fp16 d + 16 nibble bytes (q4_0 nibble order);
    y = d * kvalues[q]."""
    out = np.empty(n, np.float32)
    for i in range(n // 32):
        b = raw[i * 18 : (i + 1) * 18]
        d = f16(b[0], b[1])
        for j in range(16):
            out[i * 32 + j] = d * KVALUES_IQ4NL[b[2 + j] & 0x0F]
            out[i * 32 + j + 16] = d * KVALUES_IQ4NL[b[2 + j] >> 4]
    return out


def ref_iq4_xs(raw: bytes, n: int) -> np.ndarray:
    """136-byte super-block = fp16 d + u16 scales_h + 4 x u8 scales_l +
    128 nibble bytes; sub-block ib of 32 has 6-bit scale
    ls = scales_l nibble | (scales_h 2 bits << 4), value d*(ls-32), and
    q4_0 nibble order within the sub-block."""
    out = np.empty(n, np.float32)
    for i in range(n // 256):
        b = raw[i * 136 : (i + 1) * 136]
        d = f16(b[0], b[1])
        (sh,) = struct.unpack("<H", b[2:4])
        for ib in range(8):
            ls = ((b[4 + ib // 2] >> (4 * (ib % 2))) & 0x0F) | (((sh >> (2 * ib)) & 3) << 4)
            dl = d * (ls - 32)
            qs = b[8 + ib * 16 : 8 + (ib + 1) * 16]
            for j in range(16):
                out[i * 256 + ib * 32 + j] = dl * KVALUES_IQ4NL[qs[j] & 0x0F]
                out[i * 256 + ib * 32 + j + 16] = dl * KVALUES_IQ4NL[qs[j] >> 4]
    return out


# ---------------------------------------------------------------------------
# Scalar reference ENCODERS for the legacy formats, straight from ggml's
# quantize_row_*_ref loops (one value at a time, all arithmetic np.float32
# to mirror the reference's C floats). These pin the byte-for-byte
# llama-quantize parity contract of vision_tpu.core.quantize's legacy
# encoders — independently of that module, which shares no code here.
# K-quant encoders are deliberately NOT pinned: their fit is an ALS search,
# format-valid but not byte-identical to ggml's heuristic (see
# core/quantize.py docstring); their bytes are covered by the roundtrip
# bounds in tests/test_quantize.py through the decoder vectors above.
# ---------------------------------------------------------------------------


def _f16b(v: float) -> bytes:
    return np.float16(v).tobytes()


def _signed_max(blk) -> np.float32:
    """ggml's running `if (amax < fabsf(v)) { amax = fabsf(v); max = v; }`."""
    amax = np.float32(0.0)
    mx = np.float32(0.0)
    for v in blk:
        if amax < abs(v):
            amax, mx = abs(v), v
    return mx


def enc_q4_0(x: np.ndarray) -> bytes:
    out = bytearray()
    for i in range(len(x) // 32):
        blk = x[i * 32 : (i + 1) * 32].astype(np.float32)
        d = _signed_max(blk) / np.float32(-8.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        out += _f16b(d)
        for j in range(16):
            xi0 = min(15, int(blk[j] * idv + np.float32(8.5)))
            xi1 = min(15, int(blk[j + 16] * idv + np.float32(8.5)))
            out.append(xi0 | (xi1 << 4))
    return bytes(out)


def enc_q4_1(x: np.ndarray) -> bytes:
    out = bytearray()
    for i in range(len(x) // 32):
        blk = x[i * 32 : (i + 1) * 32].astype(np.float32)
        mn, mx = blk.min(), blk.max()
        d = (mx - mn) / np.float32(15.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        out += _f16b(d) + _f16b(mn)
        for j in range(16):
            xi0 = min(15, int((blk[j] - mn) * idv + np.float32(0.5)))
            xi1 = min(15, int((blk[j + 16] - mn) * idv + np.float32(0.5)))
            out.append(xi0 | (xi1 << 4))
    return bytes(out)


def enc_q5_0(x: np.ndarray) -> bytes:
    out = bytearray()
    for i in range(len(x) // 32):
        blk = x[i * 32 : (i + 1) * 32].astype(np.float32)
        d = _signed_max(blk) / np.float32(-16.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        qh = 0
        qs = bytearray()
        for j in range(16):
            xi0 = min(31, int(blk[j] * idv + np.float32(16.5)))
            xi1 = min(31, int(blk[j + 16] * idv + np.float32(16.5)))
            qs.append((xi0 & 0x0F) | ((xi1 & 0x0F) << 4))
            qh |= ((xi0 & 0x10) >> 4) << j
            qh |= ((xi1 & 0x10) >> 4) << (j + 16)
        out += _f16b(d) + struct.pack("<I", qh) + qs
    return bytes(out)


def enc_q5_1(x: np.ndarray) -> bytes:
    out = bytearray()
    for i in range(len(x) // 32):
        blk = x[i * 32 : (i + 1) * 32].astype(np.float32)
        mn, mx = blk.min(), blk.max()
        d = (mx - mn) / np.float32(31.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        qh = 0
        qs = bytearray()
        for j in range(16):
            xi0 = min(31, int((blk[j] - mn) * idv + np.float32(0.5)))
            xi1 = min(31, int((blk[j + 16] - mn) * idv + np.float32(0.5)))
            qs.append((xi0 & 0x0F) | ((xi1 & 0x0F) << 4))
            qh |= ((xi0 & 0x10) >> 4) << j
            qh |= ((xi1 & 0x10) >> 4) << (j + 16)
        out += _f16b(d) + _f16b(mn) + struct.pack("<I", qh) + qs
    return bytes(out)


def enc_q8_0(x: np.ndarray) -> bytes:
    """roundf = half AWAY from zero (C), not python's banker's rounding."""
    out = bytearray()
    for i in range(len(x) // 32):
        blk = x[i * 32 : (i + 1) * 32].astype(np.float32)
        amax = np.float32(max(abs(v) for v in blk)) if len(blk) else np.float32(0)
        d = amax / np.float32(127.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        out += _f16b(d)
        for v in blk:
            x0 = v * idv
            q = int(np.floor(abs(x0) + np.float32(0.5)))
            out += struct.pack("b", q if x0 >= 0 else -q)
    return bytes(out)


ENCODERS = {
    "q4_0": enc_q4_0,
    "q4_1": enc_q4_1,
    "q5_0": enc_q5_0,
    "q5_1": enc_q5_1,
    "q8_0": enc_q8_0,
}


def _encoder_input() -> np.ndarray:
    """5 blocks of 32 covering the edge cases: gaussian, all-zero, constant
    positive (min > 0 exercises the affine formats' offset), a block whose
    signed extreme is POSITIVE (negative scale in the absmax formats), and
    exact power-of-two values that land on .5 rounding ties."""
    rng = np.random.default_rng(0x51544E45)  # "QTNE"
    blocks = [
        rng.normal(size=32),
        np.zeros(32),
        np.full(32, 0.375),
        np.concatenate([[3.0], rng.normal(size=31) * 0.5]),  # +extreme
        np.linspace(-1.0, 1.0, 32),  # includes exact ties after scaling
    ]
    return np.concatenate(blocks).astype(np.float32)


# name -> (scalar decoder, elements/block, bytes/block)
FORMATS = {
    "q4_0": (ref_q4_0, 32, 18),
    "q4_1": (ref_q4_1, 32, 20),
    "q5_0": (ref_q5_0, 32, 22),
    "q5_1": (ref_q5_1, 32, 24),
    "q8_0": (ref_q8_0, 32, 34),
    "q2_k": (ref_q2_k, 256, 84),
    "q3_k": (ref_q3_k, 256, 110),
    "q4_k": (ref_q4_k, 256, 144),
    "q5_k": (ref_q5_k, 256, 176),
    "q6_k": (ref_q6_k, 256, 210),
    "q8_k": (ref_q8_k, 256, 292),
    "iq4_nl": (ref_iq4_nl, 32, 18),
    "iq4_xs": (ref_iq4_xs, 256, 136),
}


def main() -> None:
    rng = np.random.default_rng(0x67676D6C)  # "ggml"
    arrays: dict[str, np.ndarray] = {}
    for name, (decode, epb, bpb) in FORMATS.items():
        # 3 blocks of random bytes exercise every bit position; fp16 scale
        # fields are overwritten with finite values so expectations are
        # well-defined (a random fp16 can be NaN/inf).
        nb = 3
        buf = bytearray(rng.integers(0, 256, nb * bpb, dtype=np.uint8).tobytes())
        scale_spans = {  # offsets of fp16 fields within each block
            "q4_0": [0], "q4_1": [0, 2], "q5_0": [0], "q5_1": [0, 2],
            "q8_0": [0], "q2_k": [80, 82], "q3_k": [108], "q4_k": [0, 2],
            "q5_k": [0, 2], "q6_k": [208], "iq4_nl": [0], "iq4_xs": [0],
        }
        for i in range(nb):
            if name == "q8_k":  # f32 scale
                struct.pack_into("<f", buf, i * bpb, float(rng.uniform(-2, 2)))
            else:
                for off in scale_spans[name]:
                    v = np.float16(rng.uniform(-2, 2))
                    buf[i * bpb + off : i * bpb + off + 2] = v.tobytes()
        raw = bytes(buf)
        expected = decode(raw, nb * epb)
        assert np.isfinite(expected).all(), name
        arrays[f"{name}_raw"] = np.frombuffer(raw, np.uint8)
        arrays[f"{name}_expected"] = expected
    enc_in = _encoder_input()
    arrays["enc_input"] = enc_in
    for name, enc in ENCODERS.items():
        arrays[f"{name}_enc_bytes"] = np.frombuffer(enc(enc_in), np.uint8)
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "quant_vectors.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({len(arrays) // 2} formats)")


if __name__ == "__main__":
    sys.exit(main())
