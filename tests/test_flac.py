"""FLAC codec: LOSSLESS means the decode contract is bit-exact sample
recovery — round-trips compare with array_equal, never tolerance. Plus
the spec's own integrity machinery (CRC-8/CRC-16/MD5) proven to fire."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from magshield_data_pipeline_spark.operators.multimodal import (
    decode_flac,
    decode_media,
    encode_flac,
    synth_audio,
)


def test_roundtrip_exact_multi_frame():
    samples = synth_audio(3, 10_000)  # 3 frames: 4096+4096+1808
    got, rate = decode_flac(encode_flac(samples, sample_rate=22_050))
    assert rate == 22_050
    assert got.dtype == np.int16
    assert np.array_equal(got, samples)


def test_roundtrip_exact_smooth_waveform_and_it_compresses():
    """A smooth waveform is where fixed predictors earn their keep: the
    stream must be exact AND smaller than raw 16-bit PCM — proof the
    predictor+Rice path is actually taken, not verbatim fallback."""
    t = np.arange(8192)
    samples = (3000 * np.sin(t / 50.0) + 200 * np.sin(t / 7.0)).astype(np.int16)
    payload = encode_flac(samples)
    got, _ = decode_flac(payload)
    assert np.array_equal(got, samples)
    assert len(payload) < samples.nbytes * 0.8, (len(payload), samples.nbytes)


def test_constant_block_path():
    samples = np.full(5000, -123, dtype=np.int16)
    payload = encode_flac(samples)
    got, _ = decode_flac(payload)
    assert np.array_equal(got, samples)
    # two constant frames: the stream collapses to almost nothing
    assert len(payload) < 200


def test_noise_falls_back_losslessly():
    rng = np.random.RandomState(5)
    samples = rng.randint(-32768, 32767, size=3000).astype(np.int16)
    got, _ = decode_flac(encode_flac(samples))
    assert np.array_equal(got, samples)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=5000))
def test_roundtrip_property(seed, n):
    """Any length — empty, shorter than the predictor order, one
    sample, non-multiples of the blocksize — recovers exactly."""
    samples = synth_audio(seed, n)
    got, rate = decode_flac(encode_flac(samples))
    assert rate == 16_000
    assert np.array_equal(got, samples)


def test_decode_media_dispatches_flac():
    samples = synth_audio(1, 2000)
    got, rate = decode_media(encode_flac(samples), "audio")
    assert np.array_equal(got, samples)


def test_integrity_machinery_fires():
    samples = synth_audio(2, 6000)
    payload = bytearray(encode_flac(samples))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(bytes(payload[4:]))
    # corrupt one byte inside the first frame's entropy data: one of
    # the CRCs (or the MD5 backstop) must catch it — never a silent
    # wrong sample
    corrupt = bytearray(payload)
    corrupt[60] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt))
    # truncation is loud
    with pytest.raises(ValueError):
        decode_flac(bytes(payload[: len(payload) // 2]))


def test_md5_backstop_catches_forged_streaminfo():
    """Flip a bit in the STREAMINFO MD5: every frame CRC still passes,
    so only the final whole-stream MD5 verification can object — proves
    the backstop is real, not decorative."""
    samples = synth_audio(4, 1000)
    payload = bytearray(encode_flac(samples))
    payload[8 + 18] ^= 0x01  # first MD5 byte (4 magic + 4 header + 18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(payload))
