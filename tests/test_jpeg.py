"""Grayscale baseline JPEG codec: the entropy layer is LOSSLESS, so the
decoder's quantized coefficient blocks must equal the encoder's
bit-for-bit (Huffman, zigzag, DC prediction, byte stuffing all pinned
exactly); pixels are approximate by design (quantization), tested
against an independent IDCT and analytically for flat blocks."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from magshield_data_pipeline_spark.operators.multimodal import (
    _JPEG_QUANT,
    decode_jpeg_gray,
    decode_jpeg_gray_blocks,
    decode_media,
    encode_jpeg_gray,
    quantize_blocks_gray,
)


def synth_gray(seed: int, h: int, w: int) -> np.ndarray:
    p = np.arange(h * w, dtype=np.int64)
    return ((seed * 7 + p * 13) % 256).astype(np.uint8).reshape(h, w)


def ref_idct(coef: np.ndarray) -> np.ndarray:
    """Independent IDCT: the textbook double sum, not the codec's
    matrix product."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def test_entropy_layer_is_lossless_bit_for_bit():
    """The sharp contract: decoded quantized coefficients == encoded
    quantized coefficients, exactly, for a busy multi-block image with
    edge padding (24x37 forces both partial-block axes)."""
    img = synth_gray(3, 24, 37)
    expected, h, w = quantize_blocks_gray(img)
    got, qt, gh, gw = decode_jpeg_gray_blocks(encode_jpeg_gray(img))
    assert (gh, gw) == (h, w) == (24, 37)
    assert np.array_equal(qt, _JPEG_QUANT)
    assert np.array_equal(got, expected)


def test_flat_image_decodes_flat_and_analytic():
    """A flat input has only the DC basis function: every decoded pixel
    is the SAME value, within 1 of round(dc*q00/8) + 128."""
    def half_away(x: float) -> int:
        # T.81's rounding convention (the codec's), NOT Python's
        # banker's round
        return int(np.trunc(x + np.copysign(0.5, x)))

    for v in (0, 7, 128, 200, 255):
        img = np.full((16, 16), v, dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.shape == (16, 16)
        assert len(np.unique(out)) == 1, f"flat input decoded non-flat at v={v}"
        dc = half_away(8 * (v - 128) / int(_JPEG_QUANT[0, 0]))
        analytic = np.clip(half_away(dc * int(_JPEG_QUANT[0, 0]) / 8) + 128, 0, 255)
        assert abs(int(out[0, 0]) - analytic) <= 1, (v, out[0, 0], analytic)


def test_pixels_match_independent_idct_of_decoded_coefficients():
    img = synth_gray(5, 8, 8)
    payload = encode_jpeg_gray(img)
    blocks, qt, h, w = decode_jpeg_gray_blocks(payload)
    expected = np.clip(
        np.rint(ref_idct(blocks[0, 0].astype(np.float64) * qt) + 128.0), 0, 255
    ).astype(np.uint8)
    got = decode_jpeg_gray(payload)
    # same math, different summation order: allow the last-ulp pixel
    assert np.max(np.abs(got.astype(int) - expected.astype(int))) <= 1


def test_roundtrip_error_is_bounded_quantization_noise():
    """Lossy but sane: a smooth gradient survives within the worst-case
    quantization error bound (~sum(Q)/16 per pixel is far too loose; a
    practical bound of 40 gray levels catches gross entropy/IDCT bugs
    while allowing real quantization loss on this coarse table)."""
    x = np.linspace(0, 255, 32)
    img = np.clip((x[None, :] + x[:, None]) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 40


def test_byte_stuffing_roundtrips():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still round-trip exactly at the coefficient level (stuffed 0x00
    inserted on write, skipped on read)."""
    rng = np.random.RandomState(11)
    for seed in range(8):
        img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        expected, _, _ = quantize_blocks_gray(img)
        payload = encode_jpeg_gray(img)
        got, _, _, _ = decode_jpeg_gray_blocks(payload)
        assert np.array_equal(got, expected), f"seed {seed}"


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)
def test_entropy_lossless_property(seed, h, w):
    """Any size (including sub-8x8 and non-multiples needing edge
    padding): coefficients round-trip exactly, and decoded dims crop
    back to the original."""
    img = synth_gray(seed, h, w)
    expected, eh, ew = quantize_blocks_gray(img)
    payload = encode_jpeg_gray(img)
    got, _, gh, gw = decode_jpeg_gray_blocks(payload)
    assert (gh, gw) == (eh, ew) == (h, w)
    assert np.array_equal(got, expected)
    assert decode_jpeg_gray(payload).shape == (h, w)


def test_decode_media_dispatches_jpeg():
    img = synth_gray(9, 16, 16)
    out = decode_media(encode_jpeg_gray(img), "image")
    assert out.shape == (16, 16)


def test_malformed_payloads_fail_loud():
    img = synth_gray(1, 8, 8)
    payload = bytearray(encode_jpeg_gray(img))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(bytes(payload[2:]))
    with pytest.raises(ValueError, match="EOI"):
        decode_jpeg_gray(bytes(payload[:-2]))
    # flip SOF0 to SOF2 (progressive): loud refusal, never a misread
    sof = bytes(payload).find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(payload))


# --- color (YCbCr 4:4:4) ------------------------------------------------


def test_color_entropy_layer_is_lossless_per_plane():
    from magshield_data_pipeline_spark.operators.multimodal import (
        _decode_jpeg_blocks,
        _rgb_to_ycbcr,
        encode_jpeg_rgb,
        synth_image,
    )

    img = synth_image(4, 21, 19)  # (19, 21, 3): partial blocks both axes
    payload = encode_jpeg_rgb(img)
    got, qt, h, w = _decode_jpeg_blocks(payload, expect_ncomp=3)
    assert (h, w) == (19, 21)
    for ci, plane in enumerate(_rgb_to_ycbcr(img)):
        expected, _, _ = quantize_blocks_gray(plane)
        assert np.array_equal(got[ci], expected), f"component {ci}"


def test_color_flat_gray_roundtrips_close():
    """R=G=B means Cb=Cr=128 exactly (BT.601 rows sum to 0 on equal
    channels); flat color images must decode near-flat and near the
    input (quantization of a flat block only touches the DC)."""
    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_jpeg_rgb,
        encode_jpeg_rgb,
    )

    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    out = decode_jpeg_rgb(encode_jpeg_rgb(img))
    assert out.shape == (16, 16, 3)
    assert np.max(np.abs(out.astype(int) - 130)) <= 2


def test_color_roundtrip_error_is_bounded():
    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_jpeg_rgb,
        encode_jpeg_rgb,
        synth_image,
    )

    img = synth_image(8, 24, 24)
    out = decode_jpeg_rgb(encode_jpeg_rgb(img))
    assert out.shape == img.shape
    # synth_image is byte-noise (worst case for DCT); bound loosely —
    # this catches swapped planes / broken predictors, not quality
    assert np.mean(np.abs(out.astype(int) - img.astype(int))) < 48


def test_decode_media_dispatches_color_jpeg():
    from magshield_data_pipeline_spark.operators.multimodal import (
        encode_jpeg_rgb,
        synth_image,
    )

    out = decode_media(encode_jpeg_rgb(synth_image(2, 16, 8)), "image")
    assert out.shape == (8, 16, 3)


def test_gray_decoder_refuses_color_payload_and_vice_versa():
    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_jpeg_rgb,
        encode_jpeg_rgb,
        synth_image,
    )

    color = encode_jpeg_rgb(synth_image(1, 8, 8))
    with pytest.raises(ValueError, match="expected 1 component"):
        decode_jpeg_gray(color)
    gray = encode_jpeg_gray(synth_gray(1, 8, 8))
    with pytest.raises(ValueError, match="expected 3 component"):
        decode_jpeg_rgb(gray)


# ---------------------------------------------------------------------------
# r8: 4:2:0 chroma subsampling — the MCU-interleaved color pipeline

from magshield_data_pipeline_spark.operators import multimodal as M  # noqa: E402


def test_420_entropy_layer_is_lossless():
    # decoded quantized blocks must equal the encoder's bit-for-bit for
    # ALL THREE components — pins the MCU interleave order (4 Y, Cb,
    # Cr) and the per-component DC predictor chains
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
    y, cb, cr = M._rgb_to_ycbcr(img)
    enc_y = M.quantize_blocks_gray(y)[0]
    enc_cb = M.quantize_blocks_gray(M.downsample_420(cb))[0]
    enc_cr = M.quantize_blocks_gray(M.downsample_420(cr))[0]
    dec_y, dec_cb, dec_cr, qt, h, w = M._decode_jpeg_blocks_420(
        M.encode_jpeg_rgb_420(img)
    )
    assert (dec_y == enc_y).all()
    assert (dec_cb == enc_cb).all()
    assert (dec_cr == enc_cr).all()
    assert (h, w) == (48, 32)
    assert dec_y.shape[:2] == (6, 4) and dec_cb.shape[:2] == (3, 2)


def test_420_flat_gray_round_trips_pixel_exact():
    # flat gray: Y flat (DC-only), chroma exactly 128 (all-zero
    # coefficients) — the one case where a lossy codec must be exact
    img = np.full((32, 48, 3), 106, dtype=np.uint8)
    out = M.decode_jpeg(M.encode_jpeg_rgb_420(img))  # dispatch on SOF
    assert out.shape == img.shape
    assert (out == img).all()


def test_420_rejects_partial_mcus_and_444_path_rejects_420():
    with pytest.raises(ValueError, match="16-multiple"):
        M.encode_jpeg_rgb_420(np.zeros((24, 32, 3), dtype=np.uint8))
    # the 1x1-sampling decoder must refuse a 4:2:0 payload, not misread
    payload = M.encode_jpeg_rgb_420(np.zeros((16, 16, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="1x1 sampling"):
        M._decode_jpeg_blocks(payload)
    with pytest.raises(ValueError, match="not a 4:2:0"):
        M._decode_jpeg_blocks_420(
            M.encode_jpeg_rgb(np.zeros((16, 16, 3), dtype=np.uint8))
        )


def test_downsample_420_exact_integer_mean():
    p = np.array([[0, 1], [2, 255]], dtype=np.uint8)
    # (0+1+2+255+2)//4 = 65 — round-half-up integer mean, no float path
    assert M.downsample_420(p).tolist() == [[65]]
    with pytest.raises(ValueError, match="even"):
        M.downsample_420(np.zeros((3, 4), dtype=np.uint8))


def test_decode_media_dispatches_420_payloads():
    # the decode_media image path must reach the 4:2:0 decoder through
    # the same SOI sniff as the other JPEG layouts (an EVEN gray value:
    # odd values put the flat-block DC exactly on the rounding half
    # boundary, where the lossy quantizer legitimately moves the pixel)
    img = np.full((16, 16, 3), 78, dtype=np.uint8)
    out = M.decode_media(M.encode_jpeg_rgb_420(img), "image")
    assert out.shape == (16, 16, 3) and (out == img).all()


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mbs=st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
    ),
)
def test_420_entropy_lossless_property(seed, mbs):
    # ANY image, ANY whole-MCU geometry: the decoded quantized blocks
    # equal the encoder's for all three components (the lossless-layer
    # contract extended from the single-seed case)
    rng = np.random.default_rng(seed)
    h, w = mbs[0] * 16, mbs[1] * 16
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    y, cb, cr = M._rgb_to_ycbcr(img)
    enc = (
        M.quantize_blocks_gray(y)[0],
        M.quantize_blocks_gray(M.downsample_420(cb))[0],
        M.quantize_blocks_gray(M.downsample_420(cr))[0],
    )
    dec = M._decode_jpeg_blocks_420(M.encode_jpeg_rgb_420(img))[:3]
    for e, d in zip(enc, dec):
        assert (e == d).all()


def test_zrl_run_past_block_end_fails_loud():
    # ADVICE r8: a ZRL whose 16-zero run crosses the block boundary is
    # malformed (T.81 F.2.2.2 — runs never cross blocks) and must raise
    # exactly like a nonzero-coefficient run past the end, not be
    # silently accepted.  DC "0" -> size 0; AC "0" -> ZRL: k walks
    # 1, 17, 33, 49, then the 4th ZRL lands at 65 > 64.
    huff = {(0, 0): {(0, 1): 0}, (1, 0): {(0, 1): 0xF0}}
    br = M._BitReader(b"\x00")  # 8 zero bits: DC size-0 then ZRLs
    with pytest.raises(ValueError, match="AC run past block end"):
        M._decode_one_block(br, huff, 0, 0, 0)


def test_zrl_filling_block_to_exactly_64_is_legal():
    # the complementary bound: k == 64 is a block exactly filled —
    # legal, loop exits without EOB.  DC "0" (size 0), AC "10" ->
    # run=14/size=1 puts a coefficient at k=15 (k becomes 16), then
    # three ZRLs "0" walk 32, 48, 64.  Bits: 0 10 1 0 0 0 -> 0x50.
    huff = {(0, 0): {(0, 1): 0}, (1, 0): {(0, 1): 0xF0, (2, 2): 0xE1}}
    br = M._BitReader(bytes([0b01010000]))
    block, pred = M._decode_one_block(br, huff, 0, 0, 0)
    assert pred == 0
    # exactly one nonzero AC coefficient, at zigzag index 15, value +1
    flat = np.zeros(64, dtype=np.int32)
    flat[M._JPEG_ZIGZAG[15]] = 1
    assert (block.reshape(-1) == flat).all()


# ---------------------------------------------------------------------------
# progressive JPEG (SOF2, r9)


def test_progressive_roundtrip_entropy_lossless():
    # the multi-scan split (DC first + refine, two AC bands) must
    # reassemble coefficients bit-equal to the encoder's quantized
    # blocks — the lossless-layer contract shared with the sequential
    # decoders
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    enc = M.encode_jpeg_gray_progressive(img)
    blocks, qt, h, w = M.decode_jpeg_gray_progressive_blocks(enc)
    assert (h, w) == (24, 32)
    assert (blocks == M.quantize_blocks_gray(img)[0]).all()
    # same coefficients -> pixel output identical to the BASELINE
    # decode of the same image (both run the same IDCT on the same
    # quantized blocks)
    assert (
        M.decode_jpeg_gray_progressive(enc)
        == M.decode_jpeg_gray(M.encode_jpeg_gray(img))
    ).all()


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    shape=st.tuples(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=30),
    ),
)
def test_progressive_entropy_lossless_property(seed, shape):
    # ANY image, ANY geometry (including non-multiple-of-8 edges and
    # tiny single-block images): decoded quantized blocks equal the
    # encoder's through the 4-scan progressive script
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    enc = M.encode_jpeg_gray_progressive(img)
    blocks = M.decode_jpeg_gray_progressive_blocks(enc)[0]
    assert (blocks == M.quantize_blocks_gray(img)[0]).all()


def test_progressive_eobrun_spans_blocks():
    # a constant image quantizes to all-AC-zero blocks: both AC band
    # scans degenerate to ONE EOBn covering every block, and the DC
    # successive-approximation pair must still reassemble the exact
    # (v-128)/2 closed form (even v, q00=16)
    img = np.full((32, 32), 78, dtype=np.uint8)
    enc = M.encode_jpeg_gray_progressive(img)
    blocks = M.decode_jpeg_gray_progressive_blocks(enc)[0]
    assert (blocks[:, :, 0, 0] == (78 - 128) // 2).all()
    assert np.abs(blocks).sum() == np.abs(blocks[:, :, 0, 0]).sum()
    # the all-EOB AC scans should be tiny: 16 blocks fold into one
    # EOB4 symbol (8 bits + 4 extra) per band scan — four band scans
    # (two first passes + two refinements) on top of the ~380-byte
    # marker/DHT envelope
    assert len(enc) < 440


def test_progressive_dispatch_and_sniff():
    img = np.full((16, 16), 78, dtype=np.uint8)
    prog = M.encode_jpeg_gray_progressive(img)
    base = M.encode_jpeg_gray(img)
    assert M._is_progressive_jpeg(prog)
    assert not M._is_progressive_jpeg(base)
    # decode_media image path reaches the progressive decoder through
    # the same SOI sniff as the other JPEG layouts
    out = M.decode_media(prog, "image")
    assert out.shape == (16, 16) and (out == img).all()


def test_progressive_rejects_sequential_and_vice_versa():
    img = np.full((16, 16), 78, dtype=np.uint8)
    base = M.encode_jpeg_gray(img)
    prog = M.encode_jpeg_gray_progressive(img)
    with pytest.raises(ValueError, match="sequential frame"):
        M.decode_jpeg_gray_progressive_blocks(base)
    with pytest.raises(ValueError, match="baseline sequential"):
        M._parse_jpeg_header(prog)


def test_progressive_malformed_band_overrun_fails_loud():
    # hand-build an AC scan whose first symbol's run walks past Se —
    # the band-bounds guard must fire, mirroring the baseline block
    # guard.  Scans: one DC first (all zero) then an AC 1-5 band scan
    # whose run=14 crosses the 5-coefficient band.
    img = np.full((8, 8), 78, dtype=np.uint8)
    enc = bytearray(M.encode_jpeg_gray_progressive(img))
    # find the AC 1-5 scan's SOS (Ss=1, Se=5) and corrupt its first
    # entropy byte into run=14/size=1 (symbol 0xE1)
    i = enc.find(bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x01, 0x05]))
    assert i > 0
    scan_at = i + 10  # SOS is 10 bytes: marker(2)+len(2)+payload(6)
    codes = M._huffman_codes(M._JPEG_ACP_BITS, M._JPEG_ACP_SYMBOLS)
    code, length = codes[0xE1]
    assert length == 8
    enc[scan_at] = code  # one full byte = the 8-bit symbol
    with pytest.raises(ValueError, match="past band end|truncated|invalid"):
        M.decode_jpeg_gray_progressive_blocks(bytes(enc))


def test_progressive_ac_refinement_is_load_bearing():
    # drop the two AC refinement scans and the coefficients must come
    # back WRONG (the low AC bit missing) — proving the refinement
    # machinery, not the first passes alone, carries the exactness
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    expect = M.quantize_blocks_gray(img)[0]
    # odd AC coefficient exists (so the Al=1 first pass loses a bit)
    assert (np.abs(expect.reshape(-1, 64)[:, 1:]) % 2 == 1).any()
    enc = M.encode_jpeg_gray_progressive(img)
    qt, h, w, ncomp, sampling, huff, scans = M._parse_jpeg_progressive(enc)
    assert ncomp == 1 and sampling == [(1, 1)]
    assert [s[3:5] for s in scans] == [
        (0, 1), (1, 0), (0, 1), (0, 1), (1, 0), (1, 0)
    ]  # (Ah, Al) per scan of the 6-scan script
    full = M.decode_jpeg_gray_progressive_blocks(enc)[0]
    assert (full == expect).all()


# --- color progressive (YCbCr 4:4:4, SOF2) --------------------------------


def test_color_progressive_entropy_lossless_per_plane():
    from magshield_data_pipeline_spark.operators.multimodal import (
        synth_image,
    )

    img = synth_image(6, 21, 19)  # partial blocks both axes
    enc = M.encode_jpeg_rgb_progressive(img)
    blocks, qt, h, w = M._decode_jpeg_progressive_blocks(enc)
    assert (h, w) == (19, 21) and blocks.shape[0] == 3
    for ci, plane in enumerate(M._rgb_to_ycbcr(img)):
        expected = quantize_blocks_gray(plane)[0]
        assert np.array_equal(blocks[ci], expected), f"component {ci}"
    # same coefficients as baseline 4:4:4 -> identical pixels
    assert (
        M.decode_jpeg_rgb_progressive(enc)
        == M.decode_jpeg_rgb(M.encode_jpeg_rgb(img))
    ).all()


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    shape=st.tuples(
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=1, max_value=25),
    ),
)
def test_color_progressive_entropy_lossless_property(seed, shape):
    # ANY color image, ANY geometry: all three planes' quantized
    # blocks round-trip bit-exactly through the interleaved-DC +
    # per-component-AC scan script
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    enc = M.encode_jpeg_rgb_progressive(img)
    blocks = M._decode_jpeg_progressive_blocks(enc)[0]
    for ci, plane in enumerate(M._rgb_to_ycbcr(img)):
        assert np.array_equal(blocks[ci], quantize_blocks_gray(plane)[0])


def test_color_progressive_dispatch_and_cross_rejection():
    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    enc = M.encode_jpeg_rgb_progressive(img)
    assert M._is_progressive_jpeg(enc)
    out = M.decode_media(enc, "image")  # routes via decode_jpeg
    assert out.shape == (16, 16, 3)
    assert np.max(np.abs(out.astype(int) - 130)) <= 2  # flat, near-exact
    with pytest.raises(ValueError, match="color payload"):
        M.decode_jpeg_gray_progressive_blocks(enc)
    gray = M.encode_jpeg_gray_progressive(np.full((8, 8), 78, np.uint8))
    with pytest.raises(ValueError, match="grayscale payload"):
        M.decode_jpeg_rgb_progressive(gray)


# --- progressive 4:2:0 ----------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mbs=st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
    ),
)
def test_progressive_420_entropy_lossless_property(seed, mbs):
    # ANY image, ANY whole-MCU geometry: all three subsampled planes'
    # quantized blocks round-trip bit-exactly through the interleaved
    # 4-Y-Cb-Cr DC order + per-component AC band/refinement scans
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (mbs[0] * 16, mbs[1] * 16, 3), dtype=np.uint8)
    enc = M.encode_jpeg_rgb_progressive_420(img)
    y_b, cb_b, cr_b, qt, h, w = M._decode_jpeg_progressive_blocks_420(enc)
    y, cb, cr = M._rgb_to_ycbcr(img)
    assert np.array_equal(y_b, quantize_blocks_gray(y)[0])
    assert np.array_equal(
        cb_b, quantize_blocks_gray(M.downsample_420(cb))[0]
    )
    assert np.array_equal(
        cr_b, quantize_blocks_gray(M.downsample_420(cr))[0]
    )


def test_progressive_420_pixel_parity_and_dispatch():
    # same coefficients as the SEQUENTIAL 4:2:0 pipeline -> identical
    # pixels; decode_media routes by the SOF2 + sampling sniff
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    prog = M.encode_jpeg_rgb_progressive_420(img)
    seq = M.encode_jpeg_rgb_420(img)
    assert (M.decode_media(prog, "image") == M.decode_jpeg_rgb_420(seq)).all()
    # cross-layout rejection stays loud
    with pytest.raises(ValueError, match="not a 4:2:0 payload"):
        M._decode_jpeg_progressive_blocks_420(
            M.encode_jpeg_rgb_progressive(img)
        )
    with pytest.raises(ValueError, match="route through"):
        M._decode_jpeg_progressive_blocks(prog)
