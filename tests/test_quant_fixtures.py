"""Independent dequantization vectors (VERDICT r3 missing #3).

Two layers of de-circularization for the ggml quant decoders in
``vision_tpu/core/gguf.py`` (consumed by the reference through ggml in
model_transfer, src/visp/ml.cpp:283-360):

1. Frozen fixtures: ``tests/fixtures/quant_vectors.npz`` holds random byte
   blocks decoded by the SCALAR spec-derived loops in
   ``scripts/make_quant_fixtures.py`` (element-at-a-time, no shared code
   with the vectorized production decoders).
2. Hand-worked literals: byte patterns small enough to decode on paper,
   with the arithmetic written out in the comments. These cannot be wrong
   the same way any generator can.
"""

from pathlib import Path

import numpy as np
import pytest

from vision_tpu.core import gguf as G

FIXTURES = Path(__file__).parent / "fixtures" / "quant_vectors.npz"

DECODERS = {
    "q4_0": G.dequantize_q4_0,
    "q4_1": G.dequantize_q4_1,
    "q5_0": G.dequantize_q5_0,
    "q5_1": G.dequantize_q5_1,
    "q8_0": G.dequantize_q8_0,
    "q2_k": G.dequantize_q2_k,
    "q3_k": G.dequantize_q3_k,
    "q4_k": G.dequantize_q4_k,
    "q5_k": G.dequantize_q5_k,
    "q6_k": G.dequantize_q6_k,
    "q8_k": G.dequantize_q8_k,
    "iq4_nl": G.dequantize_iq4_nl,
    "iq4_xs": G.dequantize_iq4_xs,
}


@pytest.mark.parametrize("name", sorted(DECODERS))
def test_dequantize_matches_frozen_fixture(name):
    data = np.load(FIXTURES)
    raw = data[f"{name}_raw"].tobytes()
    expected = data[f"{name}_expected"]
    got = DECODERS[name](raw, len(expected))
    np.testing.assert_array_equal(got, expected, err_msg=name)
    assert got.dtype == np.float32


LEGACY_ENCODERS = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]


@pytest.mark.parametrize("name", LEGACY_ENCODERS)
def test_legacy_encoder_matches_ggml_reference_bytes(name):
    """The legacy encoders claim byte-for-byte llama-quantize parity; the
    fixture's *_enc_bytes were produced by scalar quantize_row_*_ref loops
    (f32 scalar arithmetic, one value at a time — scripts/
    make_quant_fixtures.py) over edge-case blocks including zero, constant,
    positive-extreme, and exact .5 rounding ties. Any deviation in scale
    choice, reciprocal precision, rounding association, or bit packing in
    the vectorized encoder shows up as a byte diff here."""
    from vision_tpu.core.gguf import GGMLType
    from vision_tpu.core.quantize import QUANTIZERS

    data = np.load(FIXTURES)
    x = data["enc_input"]
    got = np.frombuffer(QUANTIZERS[GGMLType[name.upper()]][0](x), np.uint8)
    np.testing.assert_array_equal(got, data[f"{name}_enc_bytes"], err_msg=name)


# -- hand-worked literals ----------------------------------------------------
# fp16 bytes used below: 1.0=0x3C00, 1.5=0x3E00, 2.0=0x4000, 0.5=0x3800,
# 0.25=0x3400, -1.0=0xBC00 (little-endian on disk: low byte first).


def test_q4_0_hand_worked():
    # d=1.5; qs[0]=0x9F -> elem0 low nibble 0xF: (15-8)*1.5 = 10.5,
    #                      elem16 high nibble 0x9: (9-8)*1.5 = 1.5;
    # qs[1]=0x08 -> elem1 (8-8)*1.5 = 0.0, elem17 (0-8)*1.5 = -12.0
    blk = bytes([0x00, 0x3E, 0x9F, 0x08] + [0] * 14)
    y = G.dequantize_q4_0(blk, 32)
    assert (y[0], y[16], y[1], y[17]) == (10.5, 1.5, 0.0, -12.0)


def test_q4_1_hand_worked():
    # d=2.0, m=-1.0; qs[0]=0x3A -> elem0 10*2-1 = 19, elem16 3*2-1 = 5
    blk = bytes([0x00, 0x40, 0x00, 0xBC, 0x3A] + [0] * 15)
    y = G.dequantize_q4_1(blk, 32)
    assert (y[0], y[16]) == (19.0, 5.0)


def test_q5_0_hand_worked():
    # d=1.0; qh=0x00010001 -> bit0 (elem0) and bit16 (elem16) set;
    # qs[0]=0x21 -> elem0 (1|16)-16 = 1, elem16 (2|16)-16 = 2;
    # qs[1]=0x00, qh bit1 clear -> elem1 = 0-16 = -16
    blk = bytes([0x00, 0x3C, 0x01, 0x00, 0x01, 0x00, 0x21] + [0] * 15)
    y = G.dequantize_q5_0(blk, 32)
    assert (y[0], y[16], y[1]) == (1.0, 2.0, -16.0)


def test_q5_1_hand_worked():
    # d=0.5, m=4.0; qh=0x80000000 -> bit31 = elem31's fifth bit;
    # qs[15]=0xF0 -> elem15 low nibble 0: 0*0.5+4 = 4.0,
    #                elem31 (0xF|16)*0.5+4 = 31*0.5+4 = 19.5
    blk = bytes([0x00, 0x38, 0x00, 0x44, 0x00, 0x00, 0x00, 0x80]
                + [0] * 15 + [0xF0])
    y = G.dequantize_q5_1(blk, 32)
    assert (y[15], y[31]) == (4.0, 19.5)


def test_q8_0_hand_worked():
    # d=0.25; q[0]=-128 -> -32.0, q[1]=127 -> 31.75
    blk = bytes([0x00, 0x34, 0x80, 0x7F] + [0] * 30)
    y = G.dequantize_q8_0(blk, 32)
    assert (y[0], y[1], y[2]) == (-32.0, 31.75, 0.0)


def test_q4_k_hand_worked():
    # d=1.0, dmin=2.0. Scale table (12 bytes):
    #   pair0 = (sm[0]&63, sm[4]&63) = (3, 1)
    #   pair5 = ((sm[9]&0xF)|((sm[1]>>6)<<4), (sm[9]>>4)|((sm[5]>>6)<<4))
    #         = (1|(1<<4), 2|(3<<4)) = (17, 50)  [sm[1]=0x40, sm[5]=0xC0, sm[9]=0x21]
    # Group 0 byte 0 = 0x5A: elem0 = 1*3*0xA - 2*1 = 28 (sub-block 0);
    # Group 2 byte 0 = 0xB4: elem160 (=64*2+32+0, sub-block 5, high nibble
    # 0xB) = 1*17*11 - 2*50 = 87
    sm = bytes([3, 0x40, 0, 0, 1, 0xC0, 0, 0, 0, 0x21, 0, 0])
    qs = bytearray(128)
    qs[0] = 0x5A        # group 0
    qs[64] = 0xB4       # group 2
    blk = bytes([0x00, 0x3C, 0x00, 0x40]) + sm + bytes(qs)
    y = G.dequantize_q4_k(blk, 256)
    assert (y[0], y[160]) == (28.0, 87.0)


def test_q5_k_hand_worked():
    # Same header/table as the Q4_K case + qh: qh[0]=0x02 -> bit1 of byte 0
    # = elem32's fifth bit (sub-block 1). pair1 = (sm[1]&63, sm[5]&63) =
    # (0x40&63, 0xC0&63) = (0, 0) -> force a visible scale with sm[1]=5:
    # pair1 = (5, 0); pair5 hi bits then come from sm[1]>>6 = 0 -> sc5 = 1.
    # Group 0 byte 0 = 0x5A: elem0 = 1*3*10 - 2*1 = 28 (no high bit);
    # elem32 = 1*5*((0x5)|16... high nibble 5 + bit -> (5+16)=21) = 105
    sm = bytes([3, 5, 0, 0, 1, 0xC0, 0, 0, 0, 0x21, 0, 0])
    qh = bytearray(32)
    qh[0] = 0x02
    qs = bytearray(128)
    qs[0] = 0x5A
    blk = bytes([0x00, 0x3C, 0x00, 0x40]) + sm + bytes(qh) + bytes(qs)
    y = G.dequantize_q5_k(blk, 256)
    assert (y[0], y[32]) == (28.0, 105.0)


def test_q2_k_hand_worked():
    # scales[0]=0x23 -> (sc=3, mn=2); scales[2]=0x11 -> (sc=1, mn=1);
    # d=1.0 (offset 80), dmin=0.5 (offset 82). First q byte = 0xE4
    # (2-bit values 0,1,2,3 at shifts 0,2,4,6):
    #   elem0  (sub-block 0, shift 0): 1*3*0 - 0.5*2 = -1.0
    #   elem32 (sub-block 2, shift 2): 1*1*1 - 0.5*1 =  0.5
    scales = bytearray(16)
    scales[0], scales[2] = 0x23, 0x11
    qs = bytearray(64)
    qs[0] = 0xE4
    blk = bytes(scales) + bytes(qs) + bytes([0x00, 0x3C, 0x00, 0x38])
    y = G.dequantize_q2_k(blk, 256)
    assert (y[0], y[32]) == (-1.0, 0.5)


def test_q3_k_hand_worked():
    # d=2.0 (offset 108). scale0 = (sc12[0]&0xF | ((sc12[8]>>0)&3)<<4) - 32
    #                            = (5 | 1<<4) - 32 = -11.
    # First q byte (offset 32) = 0x02 -> shift-0 value 2; hmask[0]=0x01
    # (bit 0 = sub-block 0's high bit, SET -> no subtract):
    #   elem0 = 2 * (-11) * 2 = -44
    # q byte 33 = 0x03, hmask[1]=0 (bit clear -> subtract 4): q = 3-4 = -1
    #   elem1 = 2 * (-11) * (-1) = 22
    hmask = bytearray(32)
    hmask[0] = 0x01
    qs = bytearray(64)
    qs[0], qs[1] = 0x02, 0x03
    sc12 = bytearray(12)
    sc12[0], sc12[8] = 0x05, 0x01
    blk = bytes(hmask) + bytes(qs) + bytes(sc12) + bytes([0x00, 0x40])
    y = G.dequantize_q3_k(blk, 256)
    assert (y[0], y[1]) == (-44.0, 22.0)


def test_q6_k_hand_worked():
    # d=0.5; int8 scales sc[0]=2, sc[2]=-3, sc[4]=1, sc[6]=4.
    # ql[0]=0x21 (low 1 / high 2), ql[32]=0x43 (low 3 / high 4),
    # qh[0]=0x1B -> high pairs q1=3, q2=2, q3=1, q4=0:
    #   elem0  = 0.5*sc[0]*((1|3<<4)-32)  = 0.5*2*17   =  17.0
    #   elem32 = 0.5*sc[2]*((3|2<<4)-32)  = 0.5*-3*3   =  -4.5
    #   elem64 = 0.5*sc[4]*((2|1<<4)-32)  = 0.5*1*-14  =  -7.0
    #   elem96 = 0.5*sc[6]*((4|0<<4)-32)  = 0.5*4*-28  = -56.0
    ql = bytearray(128)
    ql[0], ql[32] = 0x21, 0x43
    qh = bytearray(64)
    qh[0] = 0x1B
    sc = bytearray(16)
    sc[0], sc[2], sc[4], sc[6] = 2, 0x100 - 3, 1, 4
    blk = bytes(ql) + bytes(qh) + bytes(sc) + bytes([0x00, 0x38])
    y = G.dequantize_q6_k(blk, 256)
    assert (y[0], y[32], y[64], y[96]) == (17.0, -4.5, -7.0, -56.0)


def test_iq4_nl_hand_worked():
    # d=2.0; qs[0]=0x80 -> elem0 nibble 0 = kvalues[0] = -127 -> -254.0,
    #                      elem16 nibble 8 = kvalues[8] = 1   ->    2.0;
    # qs[1]=0xF7 -> elem1 kvalues[7] = -10 -> -20.0,
    #               elem17 kvalues[15] = 113 -> 226.0
    blk = bytes([0x00, 0x40, 0x80, 0xF7] + [0] * 14)
    y = G.dequantize_iq4_nl(blk, 32)
    assert (y[0], y[16], y[1], y[17]) == (-254.0, 2.0, -20.0, 226.0)
    # all-zero nibbles decode to d * kvalues[0] everywhere
    assert (y[2:16] == -254.0).all() and (y[18:] == -254.0).all()


def test_iq4_xs_hand_worked():
    # d=0.5; scales_h=0x0002 -> ib0 high bits = 2, ib1.. = 0;
    # scales_l[0]=0x31 -> ib0 low nibble 1, ib1 low nibble 3:
    #   ls(ib0) = 1 | (2<<4) = 33 -> dl = 0.5*(33-32) =  0.5
    #   ls(ib1) = 3           = 3 -> dl = 0.5*(3-32)  = -14.5
    # qs[0]=0x39 -> elem0 kvalues[9]=13 -> 6.5, elem16 kvalues[3]=-65 -> -32.5
    # qs[16]=0x08 (first byte of ib1) -> elem32 kvalues[8]=1 -> -14.5
    import struct

    sl = bytes([0x31, 0, 0, 0])
    qs = bytearray(128)
    qs[0], qs[16] = 0x39, 0x08
    blk = bytes([0x00, 0x38]) + struct.pack("<H", 2) + sl + bytes(qs)
    y = G.dequantize_iq4_xs(blk, 256)
    assert (y[0], y[16], y[32]) == (6.5, -32.5, -14.5)


def test_q8_k_hand_worked():
    # f32 d = 0.5; q[0]=-100 -> -50, q[255]=7 -> 3.5; bsums ignored
    import struct

    q = bytearray(256)
    q[0], q[255] = 0x100 - 100, 7
    blk = struct.pack("<f", 0.5) + bytes(q) + bytes(32)
    y = G.dequantize_q8_k(blk, 256)
    assert (y[0], y[255]) == (-50.0, 3.5)
