"""Baseline-JPEG codec tests (T4 final piece).

The synthetic corpus is DC-only (so the SQL oracle can mirror decoded
pixels exactly); these tests additionally drive the GENERAL machinery —
dense AC spectra through the real Huffman coder, restart markers, byte
stuffing, and the documented NotImplementedError boundaries."""

import numpy as np
import pytest

from mmgraphrag_ray.stages.multimodal import (
    JPEG_ZIGZAG,
    _idct_basis,
    _jpeg_block_value,
    decode_jpeg,
    jpeg_encode_blocks,
    make_jpeg_payload,
    synth_jpeg_table,
)


def _expected_pixels(mid: int) -> np.ndarray:
    w, h = 8 * (2 + mid % 3), 8 * (1 + mid % 4)
    px = np.zeros((h, w, 3), np.uint8)
    for yy in range(h):
        for xx in range(w):
            by, bx = yy // 8, xx // 8
            y = float(_jpeg_block_value(mid, 0, by, bx))
            cb = float(_jpeg_block_value(mid, 1, by, bx))
            cr = float(_jpeg_block_value(mid, 2, by, bx))
            r = min(255, max(0, np.floor(y + 1.402 * (cr - 128.0) + 0.5)))
            g = min(255, max(0, np.floor(
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)))
            b = min(255, max(0, np.floor(y + 1.772 * (cb - 128.0) + 0.5)))
            px[yy, xx] = (r, g, b)
    return px


def test_synth_jpegs_decode_to_formula_pixels():
    for mid in (0, 1, 5, 11, 23, 59):
        m = decode_jpeg(make_jpeg_payload(mid))
        assert (m["width"], m["height"]) == (8 * (2 + mid % 3),
                                             8 * (1 + mid % 4))
        assert np.array_equal(m["pixels"], _expected_pixels(mid))


def test_synth_payloads_are_real_jpeg_wire_format():
    p = make_jpeg_payload(7)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda",
                   b"\xff\xdd"):
        assert marker in p
    assert b"\xff\xd0" in p  # restart markers actually emitted
    t = synth_jpeg_table(5)
    assert t.num_rows == 5 and t.column("payload").type == "binary"


def _dense_roundtrip(seed: int):
    """Encode a NON-constant image with a full float DCT (dense AC
    spectra incl. runs >= 16 -> ZRL), decode, and compare against an
    independent dequant+IDCT reference: proves the AC Huffman path is
    bit-exact, not just the DC-only corpus."""
    rng = np.random.default_rng(seed)
    w, h = 24, 16
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
    a = _idct_basis()
    qtab = np.full(64, 6, np.int64)
    qtab[0] = 8
    comp_blocks = [[], [], []]
    want = [np.zeros((h, w), np.int64) for _ in range(3)]
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci in range(3):
                blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, ci] - 128.0
                f = a @ blk @ a.T                     # forward DCT
                qz = np.round(f.ravel()[JPEG_ZIGZAG]
                              / qtab.astype(np.float64)).astype(np.int64)
                comp_blocks[ci].append(qz)
                # independent reconstruction of what a correct decoder
                # must produce from these quantized coefficients
                deq = np.zeros(64, np.float64)
                deq[JPEG_ZIGZAG] = qz * qtab
                spat = a.T @ deq.reshape(8, 8) @ a
                want[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                    np.floor(spat + 128.0 + 0.5), 0, 255).astype(np.int64)
    payload = jpeg_encode_blocks(
        w, h, comp_blocks, {0: list(qtab), 1: list(qtab)},
        restart_interval=2)
    m = decode_jpeg(payload)
    y, cb, cr = (c.astype(np.float64) for c in want)
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    expect = np.stack([r, g, b], axis=-1).astype(np.uint8)
    assert np.array_equal(m["pixels"], expect)
    # lossy bound sanity IN THE CODED SPACE: each reconstructed component
    # plane stays within the quantization error envelope of its source
    # (sum over 64 coefficients of |basis| * q/2 <= 64 * 0.25 * 3 = 48)
    for ci in range(3):
        err = np.abs(want[ci] - img[:, :, ci].astype(np.int64)).max()
        assert err <= 48


def test_dense_ac_spectrum_roundtrips_bit_exact():
    for seed in (0, 1, 2):
        _dense_roundtrip(seed)


def test_unsupported_flavors_raise():
    p = bytearray(make_jpeg_payload(3))
    i = p.find(b"\xff\xc0")
    p[i + 1] = 0xC2                       # progressive SOF2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(p))
    p = bytearray(make_jpeg_payload(3))
    i = p.find(b"\xff\xc0")
    # SOF0 body: len(2) precision(1) h(2) w(2) nc(1) then (cid, hv, tq)
    p[i + 11] = 0x22                      # 2x2 subsampling on comp 1
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_byte_stuffing_is_exercised_by_the_corpus():
    # at least one synthetic payload must contain a stuffed 0xFF00 inside
    # the entropy segment (otherwise the un-stuffing path is dead code)
    # ids 161/195/251 carry stuffed bytes in the 300-image oracle corpus
    found = []
    for mid in range(300):
        p = make_jpeg_payload(mid)
        sos = p.find(b"\xff\xda")
        if b"\xff\x00" in p[sos + 14:-2]:
            found.append(mid)
    assert found, "no stuffed 0xFF00 anywhere in the corpus"
