"""Pure-stdlib RIFF/WAVE PCM codec (the audio axis of the media layer).

The container has no soundfile/librosa, but PCM WAV needs neither: the
format is a RIFF chunk walk — 'fmt ' (codec descriptor) then 'data'
(interleaved little-endian samples), possibly with LIST/INFO or other
vendor chunks in between that a correct reader must skip by declared
size.  ~100 lines of stdlib close the engine's audio decode
integration point the same way functions/png.py and functions/jpeg.py
closed the image one: ``decoder='real'`` paths do REAL sample work.
Reference analog: the media attachments on the reference's case page
(resources/test_files/test_123456.html:24-26) — a crawl fetches opaque
media bytes; a training pipeline must decode them.

Supported — the honest subset, quarantining the rest with ValueError
(the parse-stage error-sink contract, reference parser/hays.py's
error-log discipline):

- canonical PCM (wFormatTag=1), 16-bit, any channel count <= 64,
  arbitrary skippable chunks before/after 'data', odd-size chunk
  padding per RIFF;
- IEEE-float (3), A-law (6), mu-law (7), ADPCM (2, 17), and
  WAVE_FORMAT_EXTENSIBLE (0xFFFE) streams -> ValueError naming the
  codec (quarantine, not crash);
- 8/24/32-bit PCM, zero channels, zero rate, block-align mismatch ->
  ValueError;
- hostile declared sizes are checked BEFORE any size-driven slice or
  allocation (the png.py/_MAX_RAW_BYTES contract), and every
  truncation point raises ValueError, never struct/IndexError.

Exactness contract: PCM is lossless — int16 samples round-trip
bit-exactly by construction, so a doc_id-arithmetic sample grammar
(operators/multimodal.py) gives the whole decode chain an exact SQL
oracle, the same scheme the PNG/JPEG stats queries use.

Scale note: runs inside ``mapInPandas`` per Arrow batch; cost is
per-item local with zero shuffle.  Clips here are bounded (<~2k
frames); a production executor image swaps in soundfile under the
identical mapInPandas contract.
"""

from __future__ import annotations

import struct

# decode bound on the declared data-chunk size — a hostile header
# quarantines (ValueError) instead of driving a giant slice/copy;
# 64 MiB matches the png.py/jpeg.py hostile-input bound
_MAX_RAW_BYTES = 64 << 20

_FORMAT_NAMES = {
    2: "MS ADPCM",
    3: "IEEE float",
    6: "A-law",
    7: "mu-law",
    17: "IMA ADPCM",
    0xFFFE: "WAVE_FORMAT_EXTENSIBLE",
}


def encode_wav(
    sample_rate: int,
    channels: int,
    samples: bytes,
    info: bytes | None = None,
) -> bytes:
    """Encode interleaved little-endian int16 ``samples`` as a real
    RIFF/WAVE file.

    ``len(samples)`` must be a whole number of frames
    (``channels * 2`` bytes each).  When ``info`` is given, a
    LIST/INFO chunk (ICMT comment) is written BETWEEN 'fmt ' and
    'data' — deliberately, so every synthetic clip forces the decoder
    down the skip-unknown-chunk path, including RIFF's odd-size pad
    byte when the comment length is odd.
    """
    if channels <= 0:
        raise ValueError(f"channels must be positive, got {channels}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    block_align = channels * 2
    if len(samples) % block_align:
        raise ValueError(
            f"sample buffer is {len(samples)} bytes,"
            f" not a multiple of block align {block_align}"
        )
    fmt = struct.pack(
        "<HHIIHH",
        1,  # wFormatTag = PCM
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if info is not None:
        payload = b"INFO" + b"ICMT" + struct.pack("<I", len(info)) + info
        if len(info) % 2:
            payload += b"\x00"  # RIFF pads odd chunk bodies
        chunks += b"LIST" + struct.pack("<I", len(payload)) + payload
    chunks += b"data" + struct.pack("<I", len(samples)) + samples
    if len(samples) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(chunks)


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PCM WAV file -> (sample_rate, channels, n_frames,
    samples) with ``samples`` the interleaved little-endian int16
    bytes.  ValueError on anything outside the supported subset — the
    quarantine contract (see module docstring)."""
    if len(data) < 12:
        raise ValueError("truncated RIFF header")
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if riff_size + 8 > len(data):
        raise ValueError(
            f"RIFF declares {riff_size + 8} bytes, buffer has {len(data)}"
        )
    if data[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")

    pos = 12
    end = 8 + riff_size
    fmt_fields: tuple[int, int, int, int, int, int] | None = None
    samples: bytes | None = None
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header")
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        if size > _MAX_RAW_BYTES:
            raise ValueError(
                f"chunk {tag!r} declares {size} bytes"
                f" (> {_MAX_RAW_BYTES} decode bound)"
            )
        if body_start + size > end:
            raise ValueError(
                f"chunk {tag!r} declares {size} bytes, only"
                f" {end - body_start} remain"
            )
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk is {size} bytes, want >= 16")
            fmt_fields = struct.unpack_from("<HHIIHH", data, body_start)
        elif tag == b"data":
            if fmt_fields is None:
                raise ValueError("data chunk before fmt chunk")
            samples = data[body_start : body_start + size]
            break  # canonical reader: first data chunk is the payload
        # anything else (LIST/INFO, fact, cue, vendor) is skipped by size
        pos = body_start + size + (size % 2)  # RIFF odd-body pad

    if fmt_fields is None:
        raise ValueError("no fmt chunk")
    if samples is None:
        raise ValueError("no data chunk")
    wformat, channels, rate, _byte_rate, block_align, bits = fmt_fields
    if wformat != 1:
        name = _FORMAT_NAMES.get(wformat, f"wFormatTag={wformat}")
        raise ValueError(f"unsupported WAV codec: {name} (PCM only)")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16-bit PCM only)")
    if channels == 0 or channels > 64:
        raise ValueError(f"unsupported channel count {channels}")
    if rate == 0:
        raise ValueError("zero sample rate")
    if block_align != channels * 2:
        raise ValueError(
            f"block align {block_align} != channels*2 = {channels * 2}"
        )
    if len(samples) % block_align:
        raise ValueError(
            f"data chunk is {len(samples)} bytes,"
            f" not a multiple of block align {block_align}"
        )
    return rate, channels, len(samples) // block_align, samples
