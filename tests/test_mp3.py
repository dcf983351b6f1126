"""Tests for the bundled pure-numpy MPEG-1 Layer III codec pair
(operators/mp3.py) and its integration into the multimodal decode
contract.

The decoder is the deliverable (the last decode frontier from the
round-4 verdict); the encoder exists to synthesize valid fixture
bitstreams so the round trip PCM -> .mp3 -> PCM is attested without
any external codec. Reference parity: the reference deployment never
decodes audio in-process (its media handling is URL passthrough), so
these tests attest engine-native behavior."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from airflow_spark.operators.mp3 import (
    Mp3DecodeError,
    Mp3EncodeError,
    _BitWriter,
    decode_mp3,
    encode_mp3,
)

SR = 44100


def _tone(freq_hz: float, seconds: float = 0.3, amp: float = 0.8):
    t = np.arange(int(SR * seconds)) / SR
    return amp * np.sin(2 * np.pi * freq_hz * t)


def _peak_bin(x: np.ndarray, nfft: int = 8192, skip: int = 4000) -> int:
    seg = x[skip:skip + nfft] * np.hanning(nfft)
    return int(np.argmax(np.abs(np.fft.rfft(seg))))


# ---------------------------------------------------------------------------
# Round trip: spectrum in == spectrum out
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bin_k", [60, 144, 312, 480, 648, 816, 872])
def test_tone_roundtrip_peak_bin_exact(bin_k):
    """A bin-centered tone encoded then decoded lands its dominant
    spectral bin exactly where the source's is — the fingerprint
    contract op_audio_fingerprint attests through the oracle."""
    x = _tone(bin_k * SR / 8192)
    data = encode_mp3(x, SR)
    y, sr = decode_mp3(data)
    assert sr == SR
    assert len(y) >= len(x)
    assert _peak_bin(y) == bin_k == _peak_bin(x)


def test_multitone_both_components_survive():
    t = np.arange(int(SR * 0.3)) / SR
    x = 0.5 * np.sin(2 * np.pi * 500 * t) + 0.3 * np.sin(
        2 * np.pi * 2500 * t
    )
    y, _ = decode_mp3(encode_mp3(x, SR))
    nfft = 8192
    spec = np.abs(np.fft.rfft(y[4000:4000 + nfft] * np.hanning(nfft)))
    b500, b2500 = round(500 * nfft / SR), round(2500 * nfft / SR)
    # each component's energy clearly above everything else
    mask = np.ones(len(spec), bool)
    for b in (b500, b2500):
        mask[max(0, b - 4):b + 5] = False
    floor = spec[mask].max()
    assert spec[b500 - 1:b500 + 2].max() > 3 * floor
    assert spec[b2500 - 1:b2500 + 2].max() > 3 * floor


def test_roundtrip_through_audio_features_mfcc():
    """Integration: extract_audio_features' strict path now REALLY
    decodes mono Layer III — the decoded MFCC profile matches the
    WAV-path MFCCs of the same tone (same dominant mel region),
    where round 4's stub could only raise."""
    from airflow_spark.operators.multimodal import _decode_audio_impl

    x = _tone(1000.0)
    data = encode_mp3(x, SR)
    dec = _decode_audio_impl(data, {}, strict=True)  # must NOT raise
    assert dec["sample_rate"] == SR
    assert abs(dec["duration_ms"] - 313) <= 40  # frame padding tail
    # WAV-path MFCCs of the same signal: profiles correlate strongly
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    ref = _decode_audio_impl(buf.getvalue(), {}, strict=True)
    a = np.array(dec["mfcc"][1:])  # drop c0 (absolute level differs)
    b = np.array(ref["mfcc"][1:])
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.9, f"MFCC profiles diverge: corr={corr:.3f}"


# ---------------------------------------------------------------------------
# Boundary contract: unsupported features raise Mp3DecodeError
# ---------------------------------------------------------------------------


def test_unsupported_features_raise_cleanly():
    with pytest.raises(Mp3DecodeError):
        decode_mp3(b"\x00" * 64)
    # intensity stereo is inside the boundary since round 7: an
    # all-zero intensity-flagged stream decodes as silence like the
    # MS case below (every band panned all-right, zero signal)
    pcm_i, sr_i = decode_mp3(
        bytes([0xFF, 0xFB, 0x90, 0x50]) + b"\x00" * 413
    )
    assert sr_i == 44100 and np.allclose(pcm_i, 0.0)
    # all-zero joint-stereo side info decodes as silence (supported)
    pcm, sr = decode_mp3(bytes([0xFF, 0xFB, 0x90, 0x40]) + b"\x00" * 413)
    assert sr == 44100 and np.allclose(pcm, 0.0)
    # MPEG-2 / Layer II headers
    with pytest.raises(Mp3DecodeError, match="MPEG-1 Layer III"):
        decode_mp3(bytes([0xFF, 0xF3, 0x90, 0xC0]) + b"\x00" * 200)
    with pytest.raises(Mp3DecodeError, match="MPEG-1 Layer III"):
        decode_mp3(bytes([0xFF, 0xFD, 0x90, 0xC0]) + b"\x00" * 413)
    with pytest.raises(Mp3EncodeError):
        encode_mp3(np.array([]), SR)
    with pytest.raises(Mp3EncodeError):
        encode_mp3(np.ones(100), 22050)


def test_unsupported_huffman_table_raises():
    """Patch a valid stream's side info to select big-values table 17
    (the 16-23 family shares the one unvalidated code table): the
    decoder must refuse with the documented boundary error, not
    mis-decode."""
    data = bytearray(encode_mp3(_tone(1000.0), SR))
    # side info layout (mono): 4B header, then 9+5+4 bits, then
    # granule 0: 12+9+8+4+1 bits before table_select — bit offset
    # within side info = 18 + 34 = 52; table_select is 3x5 bits.
    # Patch the first table_select (value 1 -> 17).
    bitpos = 32 + 52  # from frame start
    for i, bit in enumerate([1, 0, 0, 0, 1]):  # 17 in 5 bits
        p = bitpos + i
        byte, off = p // 8, 7 - (p % 8)
        data[byte] = (data[byte] & ~(1 << off)) | (bit << off)
    with pytest.raises(Mp3DecodeError, match="table 17 outside"):
        decode_mp3(bytes(data))


def test_count1_table_b_region_decodes():
    """The count1/table-B decode path, exercised by a hand-built
    granule (big_values=0, everything in count1 quadruples): planted
    ±1 lines come back at the planted positions."""
    w = _BitWriter()
    w.write(0x7FF, 11); w.write(0b11, 2); w.write(0b01, 2); w.write(1, 1)
    w.write(9, 4)   # 128 kbps
    w.write(0, 2)   # 44.1 kHz
    w.write(0, 1); w.write(0, 1)
    w.write(0b11, 2)  # mono
    w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
    w.write(0, 9)   # main_data_begin
    w.write(0, 5); w.write(0, 4)
    # granule 0: 3 quadruples: (0,0,0,0), (1,0,0,1)+2 signs, (0,1,1,0)+2
    g0_bits = 3 * 4 + 4
    for part23, has_data in ((g0_bits, True), (0, False)):
        w.write(part23, 12)
        w.write(0, 9)    # big_values = 0
        w.write(210, 8)  # global_gain: unit amplitude
        w.write(0, 4)    # scalefac_compress 0 -> slen (0, 0)
        w.write(0, 1)
        w.write(0, 5); w.write(0, 5); w.write(0, 5)
        w.write(0, 4); w.write(0, 3)
        w.write(0, 1); w.write(0, 1)
        w.write(1, 1)    # count1table_select = B
    # main data, granule 0: quads are sent as one's complement
    w.write(0b1111, 4)                 # (0,0,0,0)
    w.write(0b0110, 4); w.write(0, 1); w.write(1, 1)  # (1,0,0,1), +,-
    w.write(0b1001, 4); w.write(1, 1); w.write(0, 1)  # (0,1,1,0), -,+
    frame = bytearray(w.pad_to_bytes())
    frame.extend(b"\x00" * (417 - len(frame)))
    y, sr = decode_mp3(bytes(frame))
    assert sr == SR and len(y) > 0 and np.all(np.isfinite(y))
    # lines 4 (+1) and 7 (-1) and 9 (-1), 10 (+1) were planted; the
    # granule is non-silent while granule 1 is silent
    assert np.max(np.abs(y)) > 0


# ---------------------------------------------------------------------------
# Totality: arbitrary bytes never raise anything but Mp3DecodeError
# ---------------------------------------------------------------------------


@given(st.binary(max_size=1024))
@settings(max_examples=200, deadline=None)
def test_decode_total_on_arbitrary_bytes(data):
    try:
        pcm, sr = decode_mp3(data)
        assert np.all(np.isfinite(pcm)) and sr in (32000, 44100, 48000)
    except Mp3DecodeError:
        pass


@given(st.binary(max_size=600))
@settings(max_examples=150, deadline=None)
def test_decode_total_on_sync_prefixed_bytes(data):
    try:
        decode_mp3(bytes([0xFF, 0xFB, 0x90, 0xC0]) + data)
    except Mp3DecodeError:
        pass


@given(
    freq=st.floats(80.0, 15000.0),
    amp=st.floats(0.05, 1.5),
    seconds=st.floats(0.05, 0.4),
)
@settings(max_examples=25, deadline=None)
def test_encode_decode_total_on_tones(freq, amp, seconds):
    """Any tone in the audible band encodes to a stream the decoder
    accepts, with finite PCM out and a valid metadata walk."""
    from airflow_spark.operators.multimodal import _parse_mp3_metadata

    x = _tone(freq, seconds, amp)
    data = encode_mp3(x, SR)
    meta = _parse_mp3_metadata(data)
    assert meta is not None and meta["sample_rate"] == SR
    assert meta["channels"] == 1 and meta["layer"] == 3
    y, sr = decode_mp3(data)
    assert sr == SR and np.all(np.isfinite(y))


def test_audio_fingerprint_pairs_cross_codec(spark):
    """A .wav and an .mp3 of the SAME tone pair up; different tones
    don't; undecodable payloads quarantine silently."""
    import io
    import wave

    from pyspark.sql import Row

    from airflow_spark.operators.multimodal import audio_fingerprint_pairs

    def wav_bytes(x):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((x * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    t1 = _tone(200 * SR / 8192)   # bin 200
    t2 = _tone(500 * SR / 8192)   # bin 500
    rows = [
        Row(media_id=1, data=wav_bytes(t1)),
        Row(media_id=2, data=encode_mp3(t1, SR)),   # same recording
        Row(media_id=3, data=wav_bytes(t2)),        # different tone
        Row(media_id=4, data=b"not audio at all"),  # quarantine
    ]
    df = spark.createDataFrame(rows, "media_id LONG, data BINARY")
    pairs = [(r.id_a, r.id_b, r.fp)
             for r in audio_fingerprint_pairs(df).collect()]
    assert pairs == [(1, 2, 200)]


@pytest.mark.parametrize("sr", [32000, 48000])
def test_tone_roundtrip_other_sample_rates(sr):
    """The 48/32 kHz MPEG-1 variants ride the same pipeline with
    their own scalefactor-band and frame-length tables: a bin-centered
    tone round-trips to the exact spectral bin at each rate."""
    nfft = 8192
    bin_k = 300
    # long enough that skip + nfft samples exist at EVERY rate
    n = 4000 + nfft + 2048
    t = np.arange(n) / sr
    x = 0.8 * np.sin(2 * np.pi * (bin_k * sr / nfft) * t)
    data = encode_mp3(x, sr)
    y, got_sr = decode_mp3(data)
    assert got_sr == sr
    seg = y[4000:4000 + nfft] * np.hanning(nfft)
    assert int(np.argmax(np.abs(np.fft.rfft(seg)))) == bin_k
    # and the metadata walker agrees on the rate and frame count
    from airflow_spark.operators.multimodal import _parse_mp3_metadata

    meta = _parse_mp3_metadata(data)
    assert meta["sample_rate"] == sr and meta["layer"] == 3


# ---------------------------------------------------------------------------
# Round 6: stereo (mid/side joint stereo) and short/mixed windows
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("block_type", ["short", "mixed"])
@pytest.mark.parametrize("bin_k", [60, 480, 872, 1600])
def test_short_block_tone_roundtrip_peak_bin_exact(block_type, bin_k):
    """Short and mixed windows (block_type 2, 12-point IMDCT with the
    band-major/window-minor reorder) round-trip a bin-centered tone to
    the exact planted bin — same contract the long path attests."""
    x = _tone(bin_k * SR / 8192)
    y, sr = decode_mp3(encode_mp3(x, SR, block_type=block_type))
    assert sr == SR
    assert _peak_bin(y) == bin_k == _peak_bin(x)


@pytest.mark.parametrize("block_type", ["short", "mixed"])
def test_short_block_gain_matches_long_path(block_type):
    """The 12-point short path must carry the same overall gain as the
    36-point long path through the shared synthesis filterbank (the
    encoder's 18/6 scale): decoded RMS within 10% across block types."""
    x = _tone(1000.0)
    y_long, _ = decode_mp3(encode_mp3(x, SR, block_type="long"))
    y_short, _ = decode_mp3(encode_mp3(x, SR, block_type=block_type))
    n = min(len(y_long), len(y_short))
    r_long = np.sqrt((y_long[:n] ** 2).mean())
    r_short = np.sqrt((y_short[:n] ** 2).mean())
    assert abs(r_short / r_long - 1.0) < 0.10


@pytest.mark.parametrize("bin_k", [60, 480, 872])
def test_stereo_ms_roundtrip_identical_channels(bin_k):
    """L == R joint-stereo (mid carries everything, side is silent):
    the downmixed decode lands the planted bin exactly, and the
    non-downmixed decode returns two near-identical channels."""
    x = _tone(bin_k * SR / 8192)
    data = encode_mp3(np.stack([x, x], axis=1), SR, kbps=256)
    y, sr = decode_mp3(data)
    assert sr == SR and y.ndim == 1
    assert _peak_bin(y) == bin_k
    st, _ = decode_mp3(data, downmix=False)
    assert st.shape[1] == 2
    denom = np.abs(st[:, 0]).max()
    assert np.abs(st[:, 0] - st[:, 1]).max() < 1e-6 * max(denom, 1e-12)


def test_stereo_ms_distinct_channels_separate():
    """L and R carrying DIFFERENT tones must come back on their own
    channels through the mid/side matrix (the side spectrum is real,
    not silence), and the downmix contains both components."""
    xl = _tone(60 * SR / 8192)
    xr = _tone(480 * SR / 8192)
    data = encode_mp3(np.stack([xl, xr], axis=1), SR, kbps=320)
    st, _ = decode_mp3(data, downmix=False)
    assert _peak_bin(st[:, 0]) == 60
    assert _peak_bin(st[:, 1]) == 480


def test_stereo_short_blocks_roundtrip():
    """Stereo x short windows compose: the same planted-bin contract
    holds when both new paths run together."""
    x = _tone(480 * SR / 8192)
    y, _ = decode_mp3(
        encode_mp3(np.stack([x, x], axis=1), SR, kbps=256,
                   block_type="short")
    )
    assert _peak_bin(y) == 480


def test_ms_with_mismatched_block_types_raises():
    """An MS-stereo granule whose two channels declare different block
    types cannot be matrixed: the decoder must refuse cleanly."""
    data = bytearray(encode_mp3(
        np.stack([_tone(1000.0), _tone(1000.0)], axis=1), SR, kbps=256,
        block_type="short",
    ))
    # stereo side info: 9+3+8 bits, then gr0-ch0 side info (59 bits);
    # flip ch1's windows_switching_flag (bit 34 of its 59) to 0 so
    # ch0 stays short while ch1 claims long
    bitpos = 32 + 20 + 59 + 12 + 9 + 8 + 4
    byte, off = bitpos // 8, 7 - (bitpos % 8)
    data[byte] &= ~(1 << off)
    with pytest.raises(Mp3DecodeError):
        decode_mp3(bytes(data))


@given(
    bin_k=st.integers(40, 2400),
    block_type=st.sampled_from(["long", "short", "mixed"]),
    stereo=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property_all_paths(bin_k, block_type, stereo):
    """Property: any bin-centered tone through any (block type,
    channel mode) combination lands its dominant bin exactly."""
    x = _tone(bin_k * SR / 8192)
    pcm = np.stack([x, x], axis=1) if stereo else x
    y, _ = decode_mp3(
        encode_mp3(pcm, SR, kbps=320, block_type=block_type)
    )
    assert _peak_bin(y) == bin_k


# ---------------------------------------------------------------------------
# Round 7: bit reservoir (main_data_begin back-pointers)
# ---------------------------------------------------------------------------


def _frame_mdbs(data: bytes) -> list[int]:
    """main_data_begin of every frame in a stream."""
    from airflow_spark.operators.mp3 import (
        _BITRATES,
        _RATES,
        _BitReader,
        _parse_side_info,
    )

    out, pos = [], 0
    while pos + 4 <= len(data):
        b2, b3 = data[pos + 2], data[pos + 3]
        flen = (
            144 * _BITRATES[(b2 >> 4) & 0xF] * 1000
            // _RATES[(b2 >> 2) & 0x3] + ((b2 >> 1) & 1)
        )
        nch = 1 if (b3 >> 6) & 0x3 == 0x3 else 2
        side = data[pos + 4:pos + 4 + (17 if nch == 1 else 32)]
        out.append(_parse_side_info(_BitReader(side), nch)[0])
        pos += flen
    return out


@pytest.mark.parametrize("stereo", [False, True])
@pytest.mark.parametrize("block_type", ["long", "short"])
def test_reservoir_repack_decodes_bit_identical(stereo, block_type):
    """repack_with_reservoir moves payload bytes into earlier frames'
    areas (nonzero main_data_begin) without changing a single decoded
    sample — the round-trip attestation for the reservoir path."""
    from airflow_spark.operators.mp3 import repack_with_reservoir

    x = _tone(440.0, seconds=0.4) + 0.3 * _tone(1230.0, seconds=0.4)
    pcm = np.stack([x, 0.5 * x], axis=1) if stereo else x
    enc = encode_mp3(pcm, SR, block_type=block_type)
    rep = repack_with_reservoir(enc)
    assert len(rep) == len(enc)  # same CBR framing
    mdbs = _frame_mdbs(rep)
    # the repack must actually exercise the reservoir, not be vacuous
    assert sum(1 for m in mdbs if m > 0) >= len(mdbs) - 1
    assert max(mdbs) <= 511
    a, r1 = decode_mp3(enc, downmix=False)
    b, r2 = decode_mp3(rep, downmix=False)
    assert r1 == r2
    assert np.array_equal(a, b)


def test_reservoir_backptr_cap_respected():
    from airflow_spark.operators.mp3 import repack_with_reservoir

    enc = encode_mp3(_tone(440.0, seconds=0.4), SR)
    rep = repack_with_reservoir(enc, max_backptr=100)
    mdbs = _frame_mdbs(rep)
    assert 0 < max(mdbs) <= 100
    a, _ = decode_mp3(enc)
    b, _ = decode_mp3(rep)
    assert np.array_equal(a, b)


def test_reservoir_underrun_raises():
    """A stream cut mid-reservoir (first frame's main_data_begin
    points before the stream start) must raise, not decode garbage."""
    from airflow_spark.operators.mp3 import repack_with_reservoir

    rep = repack_with_reservoir(encode_mp3(_tone(440.0, seconds=0.4), SR))
    b2 = rep[2]
    from airflow_spark.operators.mp3 import _BITRATES, _RATES

    flen = (
        144 * _BITRATES[(b2 >> 4) & 0xF] * 1000
        // _RATES[(b2 >> 2) & 0x3] + ((b2 >> 1) & 1)
    )
    assert _frame_mdbs(rep)[1] > 0
    with pytest.raises(Mp3DecodeError, match="reservoir underrun"):
        decode_mp3(rep[flen:])


def test_repack_rejects_reservoir_input():
    from airflow_spark.operators.mp3 import repack_with_reservoir

    rep = repack_with_reservoir(encode_mp3(_tone(440.0), SR))
    with pytest.raises(Mp3EncodeError, match="already uses"):
        repack_with_reservoir(rep)


# ---------------------------------------------------------------------------
# Round 7: scfsi (scalefactor sharing between granules)
# ---------------------------------------------------------------------------


def _frame_scfsi(data: bytes) -> list[list[int]]:
    from airflow_spark.operators.mp3 import (
        _BITRATES,
        _RATES,
        _BitReader,
        _parse_side_info,
    )

    out, pos = [], 0
    while pos + 4 <= len(data):
        b2, b3 = data[pos + 2], data[pos + 3]
        flen = (
            144 * _BITRATES[(b2 >> 4) & 0xF] * 1000
            // _RATES[(b2 >> 2) & 0x3] + ((b2 >> 1) & 1)
        )
        nch = 1 if (b3 >> 6) & 0x3 == 0x3 else 2
        side = data[pos + 4:pos + 4 + (17 if nch == 1 else 32)]
        out.append(_parse_side_info(_BitReader(side), nch)[1])
        pos += flen
    return out


@pytest.mark.parametrize("stereo", [False, True])
def test_scfsi_roundtrip_bit_identical(stereo):
    """scfsi elides granule-2 scalefactor bits for band groups whose
    values repeat granule 1's; the decoder's reuse path must
    reconstruct the exact same samples as the per-granule stream."""
    x = _tone(440.0, seconds=0.4) + 0.2 * _tone(1230.0, seconds=0.4)
    pcm = np.stack([x, 0.5 * x], axis=1) if stereo else x
    plain = encode_mp3(pcm, SR)
    shared = encode_mp3(pcm, SR, scfsi=True)
    assert len(plain) == len(shared)  # same CBR framing
    nz = [s for fs in _frame_scfsi(shared) for s in fs if s]
    assert nz, "steady tone must share at least one band group"
    a, _ = decode_mp3(plain, downmix=False)
    b, _ = decode_mp3(shared, downmix=False)
    assert np.array_equal(a, b)


def test_scfsi_composes_with_reservoir():
    from airflow_spark.operators.mp3 import repack_with_reservoir

    x = _tone(440.0, seconds=0.4)
    enc = encode_mp3(x, SR, scfsi=True)
    both = repack_with_reservoir(enc)
    assert any(s for fs in _frame_scfsi(both) for s in fs)
    assert max(_frame_mdbs(both)) > 0
    a, _ = decode_mp3(enc)
    b, _ = decode_mp3(both)
    assert np.array_equal(a, b)


def test_scfsi_requires_long_blocks():
    with pytest.raises(Mp3EncodeError, match="long windows"):
        encode_mp3(_tone(440.0), SR, block_type="short", scfsi=True)


def test_scfsi_on_short_granule_stream_raises():
    """A crafted stream with scfsi set but short-window granules must
    raise (the spec restricts scfsi to long windows)."""
    data = bytearray(encode_mp3(_tone(440.0), SR, block_type="short"))
    # set one scfsi bit in frame 0's side info: mono side info starts
    # at byte 4; bits 9 (mdb) + 5 (private) = 14, scfsi = bits 14-17
    # -> bit 14 lives in byte 4+1, mask 0x02
    data[5] |= 0x02
    with pytest.raises(Mp3DecodeError, match="scfsi"):
        decode_mp3(bytes(data))


# ---------------------------------------------------------------------------
# Round 7: intensity stereo (the last Layer III boundary item)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("is_pos", [1, 3, 5])
def test_intensity_pan_ratio_exact(is_pos):
    """A stream panned exactly at an is_pos grid point decodes with
    channel ratio tan(is_pos*pi/12) — the closed-form §2.4.3.4.9.3
    reconstruction."""
    import math

    k = math.tan(is_pos * math.pi / 12)
    s = _tone(440.0, seconds=0.4, amp=0.6)
    pcm = np.stack([s * k / (1 + k), s / (1 + k)], axis=1)
    dec, _ = decode_mp3(
        encode_mp3(pcm, SR, intensity=True), downmix=False
    )
    seg = slice(10000, 15000)
    rl = float(np.sqrt(np.mean(dec[seg, 0] ** 2)))
    rr = float(np.sqrt(np.mean(dec[seg, 1] ** 2)))
    assert abs(rl / rr - k) < 1e-3 * k + 1e-6


@pytest.mark.parametrize("pole", ["left", "right"])
def test_intensity_poles(pole):
    """is_pos 6 (all-left, the tan(pi/2) pole) and 0 (all-right)
    reconstruct a fully-panned signal with silence on the far side."""
    s = _tone(440.0, seconds=0.4, amp=0.6)
    z = np.zeros_like(s)
    pcm = np.stack([s, z] if pole == "left" else [z, s], axis=1)
    dec, _ = decode_mp3(
        encode_mp3(pcm, SR, intensity=True), downmix=False
    )
    seg = slice(10000, 15000)
    loud = dec[seg, 0 if pole == "left" else 1]
    quiet = dec[seg, 1 if pole == "left" else 0]
    assert float(np.sqrt(np.mean(loud ** 2))) > 0.1
    assert float(np.max(np.abs(quiet))) == 0.0


def test_intensity_peak_bin_survives_downmix():
    x = _tone(312 * SR / 8192)
    pcm = np.stack([0.7 * x, 0.3 * x], axis=1)
    y, _ = decode_mp3(encode_mp3(pcm, SR, intensity=True))
    assert _peak_bin(y) == 312


def test_intensity_header_bits():
    """The emitted stream really is joint stereo with mode_extension
    01 (intensity on, MS off) — not a renamed MS stream."""
    x = _tone(440.0)
    enc = encode_mp3(np.stack([x, x], axis=1), SR, intensity=True)
    b3 = enc[3]
    assert (b3 >> 6) & 0x3 == 0x1  # joint stereo
    assert (b3 >> 4) & 0x3 == 0x1  # mode_ext: intensity only


def test_intensity_requires_stereo_long():
    with pytest.raises(Mp3EncodeError, match="\\(n, 2\\)"):
        encode_mp3(_tone(440.0), SR, intensity=True)
    with pytest.raises(Mp3EncodeError, match="long"):
        encode_mp3(
            np.stack([_tone(440.0)] * 2, axis=1), SR,
            block_type="short", intensity=True,
        )


def test_intensity_composes_with_reservoir():
    from airflow_spark.operators.mp3 import repack_with_reservoir

    x = _tone(440.0, seconds=0.4)
    pcm = np.stack([0.7 * x, 0.3 * x], axis=1)
    enc = encode_mp3(pcm, SR, intensity=True)
    rep = repack_with_reservoir(enc)
    assert max(_frame_mdbs(rep)) > 0
    a, _ = decode_mp3(enc, downmix=False)
    b, _ = decode_mp3(rep, downmix=False)
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# Round 8: foreign-stream robustness (round-7 ADVICE items)
# ---------------------------------------------------------------------------


def _frame_lengths(data: bytes):
    """Yield (pos, frame_len) for every frame in a clean stream."""
    from airflow_spark.operators.mp3 import _BITRATES, _RATES

    pos = 0
    while pos + 4 <= len(data):
        b2 = data[pos + 2]
        flen = (
            144 * _BITRATES[(b2 >> 4) & 0xF] * 1000
            // _RATES[(b2 >> 2) & 0x3] + ((b2 >> 1) & 1)
        )
        yield pos, flen
        pos += flen


def _patch_mode_ext(data: bytes, mode_ext: int) -> bytes:
    """Rewrite every frame header's mode_extension (b3 bits 5-4) —
    synthesizes 'foreign' joint-stereo streams the bundled encoder
    never emits, e.g. intensity-flagged frames whose right channel
    carries full-band spectral data."""
    out = bytearray(data)
    for pos, _flen in _frame_lengths(data):
        out[pos + 3] = (out[pos + 3] & 0xCF) | (mode_ext << 4)
    return bytes(out)


def _set_bits(buf: bytearray, bitpos: int, width: int, value: int) -> None:
    """Write ``width`` bits of ``value`` MSB-first at absolute bit
    offset ``bitpos`` into ``buf``."""
    for i in range(width):
        bit = (value >> (width - 1 - i)) & 1
        byte, off = divmod(bitpos + i, 8)
        mask = 0x80 >> off
        buf[byte] = (buf[byte] & ~mask) | (mask if bit else 0)


def test_intensity_right_channel_past_band21_decodes():
    """de1 (the right channel's zero-part start) past sfb[21] = 418
    must yield an EMPTY intensity region (b0i = 22), not a bare
    StopIteration escaping the Mp3DecodeError contract: sfb has 23
    edges (sfb[22] = 576) and the bound search must span all of them.

    The bundled encoder drops lines above sfb[21], so the stream is
    crafted at the bit level: re-flag an MS stream as intensity-only
    and patch each granule's CHANNEL-1 side info to big_values = 230
    with region-0 table select 0 — table-0 pairs cost zero bits, so
    the main data is untouched but the right channel's Huffman data
    now 'ends' at line 460 > 418."""
    lo = _tone(440.0, seconds=0.4, amp=0.6)
    # identical channels -> the MS side channel (channel 1) carries no
    # main data at all, so its part2_3_length is scalefactors only and
    # the big_values patch below adds exactly the zero-bit table-0 pairs
    enc = encode_mp3(np.stack([lo, lo], axis=1), SR)
    foreign = bytearray(_patch_mode_ext(enc, 0b01))  # MS -> intensity
    # stereo side-info layout (no CRC): 9 mdb + 3 private + 8 scfsi,
    # then 59 bits per (granule, channel) block — ch1 blocks start at
    # bits 79 (granule 0) and 197 (granule 1); within a block:
    # part23(12) big_values(9) gg(8) sc(4) wsf(1) tsel0(5) ...
    for pos, _flen in _frame_lengths(bytes(foreign)):
        side0 = (pos + 4) * 8
        for ch1_bit in (79, 197):
            _set_bits(foreign, side0 + ch1_bit + 12, 9, 230)  # big_values
            _set_bits(foreign, side0 + ch1_bit + 34, 1, 0)    # wsf = 0
            _set_bits(foreign, side0 + ch1_bit + 35, 5, 0)    # tsel0 = 0
            _set_bits(foreign, side0 + ch1_bit + 40, 5, 0)    # tsel1 = 0
            _set_bits(foreign, side0 + ch1_bit + 45, 5, 0)    # tsel2 = 0
    dec, sr = decode_mp3(bytes(foreign), downmix=False)
    assert sr == SR and dec.shape[1] == 2
    assert np.all(np.isfinite(dec))
    # an empty intensity region modifies nothing: the decode must
    # equal the same stream with joint-stereo extensions all off
    plain = bytearray(foreign)
    for pos, _flen in _frame_lengths(bytes(plain)):
        plain[pos + 3] = plain[pos + 3] & 0xCF  # mode_ext = 00
    ref, _ = decode_mp3(bytes(plain), downmix=False)
    assert np.array_equal(dec, ref)
    assert float(np.sqrt(np.mean(dec[10000:15000, 0] ** 2))) > 0.05


@pytest.mark.parametrize("is_pos", [8, 9, 10, 15])
def test_intensity_illegal_is_pos_is_intensity_off(is_pos):
    """Bands 0-10 carry 4-bit scalefactor slots, so foreign/corrupt
    streams can encode is_pos 8-15; the spec defines only 0-7, and
    feeding 9 to tan() would amplify the band by ~4.5e15×.  Anything
    above 6 is treated as the escape: intensity off, channels stay
    independent."""
    from airflow_spark.operators.mp3 import _intensity_pan

    c0 = np.ones(32)
    c1 = np.full(32, 2.0)
    _intensity_pan(c0, c1, 4, 12, is_pos)
    assert np.array_equal(c0, np.ones(32))
    assert np.array_equal(c1, np.full(32, 2.0))


def _with_crc(data: bytes) -> bytes:
    """Convert a no-CRC stream into CRC-protected frames (protection
    bit 0, 2 CRC bytes after the header), consuming 2 bytes of each
    frame's ancillary padding so frame lengths are unchanged."""
    from airflow_spark.operators.mp3 import (
        _BitReader,
        _crc16_protection,
        _parse_side_info,
    )

    out = []
    for pos, flen in _frame_lengths(data):
        frame = data[pos:pos + flen]
        nch = 1 if (frame[3] >> 6) & 0x3 == 0x3 else 2
        side_len = 17 if nch == 1 else 32
        side = frame[4:4 + side_len]
        rest = frame[4 + side_len:]
        _mdb, _scfsi, sideinfo = _parse_side_info(_BitReader(side), nch)
        used = (sum(t[0] for g in sideinfo for t in g) + 7) // 8
        assert used <= len(rest) - 2, "no padding slack for CRC bytes"
        hdr = bytes([frame[0], frame[1] & 0xFE, frame[2], frame[3]])
        crc = _crc16_protection(hdr, side)
        out.append(hdr + bytes([crc >> 8, crc & 0xFF]) + side + rest[:-2])
    return b"".join(out)


def test_repack_recomputes_crc16():
    """repack_with_reservoir patches main_data_begin in the side info,
    which the ISO §2.4.3.1 CRC-16 covers — the rewritten frames must
    carry a freshly computed CRC (round-7 ADVICE: stale CRCs made the
    output invalid for conformant external decoders even though the
    bundled decoder skips them)."""
    from airflow_spark.operators.mp3 import (
        _crc16_protection,
        repack_with_reservoir,
    )

    plain = encode_mp3(_tone(440.0, seconds=0.4), SR)
    crc_stream = _with_crc(plain)
    a, _ = decode_mp3(plain)
    b, _ = decode_mp3(crc_stream)
    assert np.array_equal(a, b)  # the CRC variant is bit-equivalent

    rep = repack_with_reservoir(crc_stream)
    c, _ = decode_mp3(rep)
    assert np.array_equal(a, c)
    n_frames = n_reservoir = 0
    for pos, _flen in _frame_lengths(rep):
        assert not (rep[pos + 1] & 0x1)  # still CRC-protected
        side = rep[pos + 6:pos + 6 + 17]
        stored = (rep[pos + 4] << 8) | rep[pos + 5]
        assert stored == _crc16_protection(rep[pos:pos + 4], side)
        mdb = (side[0] << 1) | (side[1] >> 7)
        n_reservoir += mdb > 0
        n_frames += 1
    assert n_frames > 1 and n_reservoir >= n_frames - 1


# ---------------------------------------------------------------------------
# Round 8: big-values Huffman tables 2-9 (ADR 0001 boundary narrowed)
# ---------------------------------------------------------------------------


def test_bv_tables_complete_and_prefix_free():
    """Every shipped Table B.7 transcription must be a COMPLETE
    prefix-free code (Kraft sum exactly 1 over all (x, y) symbols and
    no codeword a prefix of another): a complete prefix code is a full
    binary tree, so any single transcription error — wrong length,
    wrong code, duplicate — fails one of the two checks. (Documented
    blind spot: a coordinated SWAP of two same-length codes is a
    double error the checks cannot see; it would require misrecalling
    both entries as exactly each other's value, which is why tables
    whose recall needed any repair beyond a forced unique completion
    stay excluded — see ADR 0001 on tables 16-23.)"""
    from fractions import Fraction

    from airflow_spark.operators.mp3 import _HUFF_BV_DEC, _HUFF_BV_ENC

    assert sorted(_HUFF_BV_ENC) == (
        [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15] + list(range(24, 32))
    )
    # the 25-31 escape aliases share table 24's dict objects
    for t in range(25, 32):
        assert _HUFF_BV_ENC[t] is _HUFF_BV_ENC[24]
        assert _HUFF_BV_DEC[t] is _HUFF_BV_DEC[24]
    for t, enc in _HUFF_BV_ENC.items():
        n = int(len(enc) ** 0.5)
        assert n * n == len(enc), f"table {t} not square"
        assert set(enc) == {(x, y) for x in range(n) for y in range(n)}
        kraft = sum(Fraction(1, 2 ** ln) for _c, ln in enc.values())
        assert kraft == 1, f"table {t} kraft {kraft}"
        words = sorted(
            format(c, f"0{ln}b") for c, ln in enc.values()
        )
        assert len(set(words)) == len(words), f"table {t} dup code"
        for a, b in zip(words, words[1:]):
            assert not b.startswith(a), f"table {t}: {a} prefixes {b}"
        # decode map is the exact inverse of the encode map
        assert len(_HUFF_BV_DEC[t]) == len(enc)
        for xy, (c, ln) in enc.items():
            assert _HUFF_BV_DEC[t][format(c, f"0{ln}b")] == xy


def _frame_tsel0(data: bytes) -> int:
    """table_select of granule 0 region 0 of the first (mono) frame."""
    from airflow_spark.operators.mp3 import _BitReader

    r = _BitReader(data[4:36])
    r.read(9 + 5 + 4)        # mdb, private, scfsi
    r.read(12 + 9 + 8 + 4)   # part23, big_values, gg, sc
    assert r.read(1) == 0    # long windows
    return r.read(5)


@pytest.mark.parametrize("levels,want_table", [
    (2, 2), (3, 5), (5, 7),
    # round 8: the 8x8 / 16x16 direct tables and the 24-31 escape
    # family (symbol 15 + linbits) — levels 16/30 plant |value| > 15
    (7, 10), (10, 13), (15, 15), (16, 24), (30, 24),
])
def test_multilevel_roundtrip_uses_bigger_tables(levels, want_table):
    """quant_levels > 1 emits multi-bit big-values and the decode
    reproduces the planted peak bin exactly — the end-to-end
    attestation of the table 2-15 and linbits decode paths."""
    enc = encode_mp3(_tone(312 * SR / 8192, seconds=0.4), SR,
                     quant_levels=levels)
    assert _frame_tsel0(enc) == want_table
    y, sr = decode_mp3(enc)
    assert sr == SR
    assert _peak_bin(y) == 312
    assert np.all(np.isfinite(y))


def test_multilevel_improves_two_tone_ratio():
    """With levels=1 every kept line in a band collapses to ±1; with
    levels=5 the within-band amplitude ORDER of two close tones in the
    same scalefactor band survives the round trip."""
    t = np.arange(int(SR * 0.4)) / SR
    f1 = 300 * SR / 8192  # bins 300 and 303: same long sfb
    f2 = 303 * SR / 8192
    x = 0.8 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
    y5, _ = decode_mp3(encode_mp3(x, SR, quant_levels=5))
    seg = y5[4000:4000 + 8192] * np.hanning(8192)
    mag = np.abs(np.fft.rfft(seg))
    assert mag[300] > 1.5 * mag[303] > 0  # order + separation kept


def test_region_switching_decodes_mixed_tables():
    """A hand-built granule whose region 0 (lines < sfb[1] = 4, i.e.
    region0_count = 0) uses table 2 while regions 1-2 use table 1:
    planted values land on the right lines with the right magnitudes,
    attesting the decoder honors region0/region1_count boundaries
    instead of applying table_select[0] everywhere."""
    w = _BitWriter()
    w.write(0x7FF, 11); w.write(0b11, 2); w.write(0b01, 2); w.write(1, 1)
    w.write(9, 4)   # 128 kbps
    w.write(0, 2)   # 44.1 kHz
    w.write(0, 1); w.write(0, 1)
    w.write(0b11, 2)  # mono
    w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
    w.write(0, 9)   # main_data_begin
    w.write(0, 5); w.write(0, 4)
    # granule 0: 4 big-value pairs; pairs 0-1 (lines 0-3) in region 0
    # -> table 2 (values up to 2), pairs 2-3 (lines 4-7) in region 1
    # -> table 1. Table 2 codes: (2,1)=len5 '00010', (0,2)=len6
    # '000001'; table 1: (1,1)=len3 '000', (1,0)=len2 '01'.
    g0_bits = (5 + 2) + (6 + 1) + (3 + 2) + (2 + 1)
    for part23, bv, tsel0 in ((g0_bits, 4, 2), (0, 0, 0)):
        w.write(part23, 12)
        w.write(bv, 9)   # big_values pairs
        w.write(210, 8)  # global_gain: unit amplitude
        w.write(0, 4)    # scalefac_compress 0 -> slen (0, 0)
        w.write(0, 1)    # long windows
        w.write(tsel0, 5)  # region 0 table
        w.write(1, 5)      # region 1 table
        w.write(1, 5)      # region 2 table
        w.write(0, 4)    # region0_count = 0 -> boundary at sfb[1] = 4
        w.write(7, 3)    # region1_count
        w.write(0, 1); w.write(0, 1)
        w.write(1, 1)    # count1table_select = B
    # main data, granule 0 (region 0, table 2):
    w.write(0b00010, 5); w.write(0, 1); w.write(1, 1)  # (2,1) signs +,-
    w.write(0b000001, 6); w.write(0, 1)                # (0,2) sign +
    # region 1, table 1:
    w.write(0b000, 3); w.write(1, 1); w.write(0, 1)    # (1,1) signs -,+
    w.write(0b01, 2); w.write(0, 1)                    # (1,0) sign +
    frame = bytearray(w.pad_to_bytes())
    frame.extend(b"\x00" * (417 - len(frame)))

    from airflow_spark.operators.mp3 import (
        _BitReader,
        _decode_granule,
        _parse_side_info,
        _SFB_LONG,
    )

    _mdb, _scfsi, side = _parse_side_info(_BitReader(bytes(frame[4:21])), 1)
    (part23, bv, gg, sc, tsel, pre, sfs, c1t, bt, mixed, sbg,
     r0, r1) = side[0][0]
    assert (bv, tsel[0], tsel[1], r0) == (4, 2, 1, 0)
    sfb = _SFB_LONG[SR]
    flat, _sf, de = _decode_granule(
        _BitReader(bytes(frame[21:])), part23, bv, gg, sc, tsel, c1t,
        sfs, pre, sfb, region_bounds=(sfb[r0 + 1], sfb[r0 + r1 + 2]),
    )
    assert de == 8
    two = 2.0 ** (4.0 / 3.0)
    np.testing.assert_allclose(
        flat[:8], [two, -1.0, 0.0, two, -1.0, 1.0, 1.0, 0.0], rtol=1e-12
    )
    # and the full frame decodes end-to-end
    y, sr = decode_mp3(bytes(frame))
    assert sr == SR and np.all(np.isfinite(y))


def _esc_frame(tsel0: int) -> bytearray:
    """A hand-built mono frame whose granule 0 carries one big-value
    pair coded with escape-family table ``tsel0``: x = +20 (symbol 15
    + linbits 5), y = -17 (symbol 15 + linbits 2)."""
    from airflow_spark.operators.mp3 import _BV_LINBITS

    lb = _BV_LINBITS[tsel0]
    w = _BitWriter()
    w.write(0x7FF, 11); w.write(0b11, 2); w.write(0b01, 2); w.write(1, 1)
    w.write(9, 4)   # 128 kbps
    w.write(0, 2)   # 44.1 kHz
    w.write(0, 1); w.write(0, 1)
    w.write(0b11, 2)  # mono
    w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
    w.write(0, 9)   # main_data_begin
    w.write(0, 5); w.write(0, 4)
    # table 24 family code for (15, 15) is 4 bits ('0011'); each ESC
    # symbol reads linbits magnitude bits then a sign bit
    g0_bits = 4 + (lb + 1) * 2
    for part23, bv, tsel in ((g0_bits, 1, tsel0), (0, 0, 0)):
        w.write(part23, 12)
        w.write(bv, 9)
        w.write(210, 8)  # global_gain: unit amplitude
        w.write(0, 4)    # scalefac_compress 0
        w.write(0, 1)    # long windows
        w.write(tsel, 5)
        w.write(0, 5)
        w.write(0, 5)
        w.write(0, 4); w.write(7, 3)
        w.write(0, 1); w.write(0, 1)
        w.write(1, 1)    # count1table_select = B
    w.write(0b0011, 4)   # (15, 15)
    w.write(5, lb); w.write(0, 1)   # x = 15 + 5 = 20, sign +
    w.write(2, lb); w.write(1, 1)   # y = 15 + 2 = 17, sign -
    frame = bytearray(w.pad_to_bytes())
    frame.extend(b"\x00" * (417 - len(frame)))
    return frame


@pytest.mark.parametrize("tsel0", [24, 27, 30, 31])
def test_escape_family_linbits_decode_exact(tsel0):
    """Escape tables 24-31 share one code tree but differ in linbits:
    a planted (x, y) = (+20, -17) pair must requantize to exactly
    (20^(4/3), -17^(4/3)) through every family member — attesting the
    alias wiring AND the per-table linbits width on the decode path."""
    frame = _esc_frame(tsel0)

    from airflow_spark.operators.mp3 import (
        _BitReader,
        _decode_granule,
        _parse_side_info,
        _SFB_LONG,
    )

    _mdb, _scfsi, side = _parse_side_info(_BitReader(bytes(frame[4:21])), 1)
    (part23, bv, gg, sc, tsel, pre, sfs, c1t, bt, mixed, sbg,
     r0, r1) = side[0][0]
    assert (bv, tsel[0]) == (1, tsel0)
    sfb = _SFB_LONG[SR]
    flat, _sf, _de = _decode_granule(
        _BitReader(bytes(frame[21:])), part23, bv, gg, sc, tsel, c1t,
        sfs, pre, sfb, region_bounds=(sfb[r0 + 1], sfb[r0 + r1 + 2]),
    )
    np.testing.assert_allclose(
        flat[:3], [20.0 ** (4.0 / 3.0), -(17.0 ** (4.0 / 3.0)), 0.0],
        rtol=1e-12,
    )
    y, sr = decode_mp3(bytes(frame))
    assert sr == SR and np.all(np.isfinite(y))


@pytest.mark.parametrize("tsel0", [16, 19, 23])
def test_tables_16_to_23_raise_decode_error(tsel0):
    """Tables 16-23 (the one unvalidated shared code table) stay
    outside the decode boundary: selecting them must raise
    Mp3DecodeError — the quarantine contract multimodal.py relies on —
    never a bare KeyError/StopIteration that would kill a Spark task."""
    from airflow_spark.operators.mp3 import Mp3DecodeError

    with pytest.raises(Mp3DecodeError, match="table"):
        decode_mp3(bytes(_esc_frame(tsel0)))


def test_direct_tables_11_and_12_decode_exact():
    """Tables 11/12 are never emitted by the encoder (13/15 win on
    coverage), so attest them with hand-built streams: planted values
    on the 8x8 grid decode to the exact requantized magnitudes."""
    from airflow_spark.operators.mp3 import (
        _BitReader,
        _decode_granule,
        _parse_side_info,
        _HUFF_BV_ENC,
        _SFB_LONG,
    )

    for tbl, (x, y) in ((11, (7, 3)), (12, (6, 5))):
        code, nbits = _HUFF_BV_ENC[tbl][(x, y)]
        w = _BitWriter()
        w.write(0x7FF, 11); w.write(0b11, 2); w.write(0b01, 2)
        w.write(1, 1); w.write(9, 4); w.write(0, 2)
        w.write(0, 1); w.write(0, 1); w.write(0b11, 2)
        w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
        w.write(0, 9); w.write(0, 5); w.write(0, 4)
        g0_bits = nbits + 2  # two sign bits
        for part23, bv, tsel in ((g0_bits, 1, tbl), (0, 0, 0)):
            w.write(part23, 12); w.write(bv, 9); w.write(210, 8)
            w.write(0, 4); w.write(0, 1)
            w.write(tsel, 5); w.write(0, 5); w.write(0, 5)
            w.write(0, 4); w.write(7, 3)
            w.write(0, 1); w.write(0, 1); w.write(1, 1)
        w.write(code, nbits)
        w.write(0, 1)  # x positive
        w.write(1, 1)  # y negative
        frame = bytearray(w.pad_to_bytes())
        frame.extend(b"\x00" * (417 - len(frame)))
        _mdb, _scfsi, side = _parse_side_info(
            _BitReader(bytes(frame[4:21])), 1
        )
        (part23, bv, gg, sc, tsel, pre, sfs, c1t, bt, mixed, sbg,
         r0, r1) = side[0][0]
        sfb = _SFB_LONG[SR]
        flat, _sf, _de = _decode_granule(
            _BitReader(bytes(frame[21:])), part23, bv, gg, sc, tsel,
            c1t, sfs, pre, sfb,
            region_bounds=(sfb[r0 + 1], sfb[r0 + r1 + 2]),
        )
        np.testing.assert_allclose(
            flat[:2], [x ** (4.0 / 3.0), -(y ** (4.0 / 3.0))],
            rtol=1e-12,
        )


@pytest.mark.skipif(
    __import__("shutil").which("ffmpeg") is None,
    reason="ffmpeg (independent encoder) not on PATH",
)
def test_foreign_encoder_golden_stream_spectrum():
    """Foreign-stream interop attestation (closes the same-length-swap
    blind spot documented in test_bv_tables_complete_and_prefix_free
    for whatever tables the foreign encoder actually selects): encode
    a bin-centered tone with an INDEPENDENT encoder (ffmpeg/libmp3lame
    — none of our tables, none of our bit-writing), decode the bytes
    with OUR decoder, and assert the dominant spectral bin survives
    the round trip. If the foreign stream selects the excluded tables
    16-23 the decode raises and the test SKIPS — that is the honest
    boundary (ADR 0001), and the external-decoder hook is the
    production path for such corpora."""
    import subprocess

    from airflow_spark.operators.mp3 import Mp3DecodeError, decode_mp3

    sr, nfft = 44100, 8192
    bin_k = 172  # ~926 Hz, mid-band
    t = np.arange(int(sr * 0.5)) / sr
    tone = 0.6 * np.sin(2 * np.pi * (bin_k * sr / nfft) * t)
    pcm = (tone * 32767).astype("<i2").tobytes()
    try:
        enc = subprocess.run(
            ["ffmpeg", "-v", "error", "-f", "s16le", "-ar", str(sr),
             "-ac", "1", "-i", "pipe:0", "-codec:a", "libmp3lame",
             "-b:a", "128k", "-f", "mp3", "pipe:1"],
            input=pcm, capture_output=True, timeout=120, check=True,
        ).stdout
    except subprocess.CalledProcessError:
        pytest.skip("ffmpeg lacks libmp3lame")
    # strip any ID3v2 header ffmpeg prepends (decode_mp3 wants frames)
    if enc[:3] == b"ID3":
        size = (
            (enc[6] << 21) | (enc[7] << 14) | (enc[8] << 7) | enc[9]
        )
        enc = enc[10 + size:]
    try:
        y, got_sr = decode_mp3(enc)
    except Mp3DecodeError as ex:
        if "outside the supported set" in str(ex):
            pytest.skip(f"foreign stream selects excluded tables: {ex}")
        raise
    assert got_sr == sr
    seg = y[4000:4000 + nfft] * np.hanning(nfft)
    peak = int(np.argmax(np.abs(np.fft.rfft(seg))))
    assert abs(peak - bin_k) <= 1, (peak, bin_k)


def test_patch_table_select_rejects_window_switching():
    """Bits 84-88 are only region-0 table_select in a LONG-block
    granule; a short/window-switching frame passes the header guards
    but must raise instead of silently patching block_type bits."""
    from airflow_spark.operators.mp3 import (
        Mp3EncodeError,
        encode_mp3,
        patch_table_select,
    )

    t = np.arange(int(SR * 0.04)) / SR
    enc = encode_mp3(
        0.5 * np.sin(2 * np.pi * 1000.0 * t), SR, block_type="short"
    )
    with pytest.raises(Mp3EncodeError, match="window-switching"):
        patch_table_select(enc, 16)


def test_patch_table_select_rejects_truncated_frame():
    """A buffer that passes the 4-byte header checks but ends before
    the side-info bytes the patch reads/writes (bytes 10-11) must
    raise Mp3EncodeError, not IndexError."""
    from airflow_spark.operators.mp3 import (
        Mp3EncodeError,
        encode_mp3,
        patch_table_select,
    )

    t = np.arange(int(SR * 0.04)) / SR
    enc = encode_mp3(0.5 * np.sin(2 * np.pi * 1000.0 * t), SR)
    for cut in (4, 8, 11):
        with pytest.raises(Mp3EncodeError, match="truncated"):
            patch_table_select(enc[:cut], 16)
