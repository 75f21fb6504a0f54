"""functions/jpeg.py — the pure stdlib+numpy baseline JPEG codec.

Contracts pinned here (mirrors test_png.py):
- flat-tile images round-trip BIT-EXACTLY (unit quant tables, DC-only
  blocks — the exactness contract jpeg_decode_stats' oracle relies on);
- arbitrary images round-trip within +-2 (FDCT/IDCT float rounding);
- EVERY truncation point raises ValueError, never struct/IndexError
  (the quarantine contract);
- progressive/extended/arithmetic/subsampled/12-bit/restart streams
  are quarantined by name;
- hostile declared dimensions are rejected before allocation;
- the Spark path (media_payloads_jpeg -> jpeg_pixel_stats) matches the
  tile grammar.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from indigent_defense_stats_spark.functions import jpeg
from indigent_defense_stats_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


def _tile_image(d: int):
    bw = 1 + d % multimodal.JPEG_BW_MOD
    bh = 1 + (d // multimodal.JPEG_BW_MOD) % multimodal.JPEG_BW_MOD
    tiles = (
        (d * multimodal.JPEG_TILE_A + np.arange(bw * bh) * multimodal.JPEG_TILE_B)
        % 256
    ).astype(np.uint8)
    img = np.kron(tiles.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8))
    return bw * 8, bh * 8, tiles, img


def test_flat_tiles_roundtrip_bit_exact():
    for d in (0, 1, 5, 17, 123, 999):
        w, h, _tiles, img = _tile_image(d)
        data = jpeg.encode_jpeg(w, h, img.tobytes())
        gw, gh, nc, px = jpeg.decode_jpeg(data)
        assert (gw, gh, nc) == (w, h, 1)
        assert px == img.tobytes(), f"doc {d} not bit-exact"


def test_arbitrary_image_roundtrip_tolerance():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    data = jpeg.encode_jpeg(40, 24, img.tobytes())
    w, h, nc, px = jpeg.decode_jpeg(data)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 40)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_three_component_and_crop():
    px3 = np.zeros((8, 8, 3), dtype=np.uint8)
    px3[..., 0], px3[..., 1], px3[..., 2] = 10, 128, 250
    d3 = jpeg.encode_jpeg(8, 8, px3.tobytes(), n_components=3)
    w, h, nc, out = jpeg.decode_jpeg(d3)
    assert (w, h, nc) == (8, 8, 3)
    assert out == px3.tobytes()
    # non-multiple-of-8: encoder edge-replicates, decoder crops back
    px2 = np.full((10, 13), 77, dtype=np.uint8)
    d2 = jpeg.encode_jpeg(13, 10, px2.tobytes())
    w, h, nc, out = jpeg.decode_jpeg(d2)
    assert (w, h, nc) == (13, 10, 1)
    assert out == px2.tobytes()


def test_every_truncation_point_is_valueerror():
    _, _, _, img = _tile_image(7)
    data = jpeg.encode_jpeg(img.shape[1], img.shape[0], img.tobytes())
    for cut in range(0, len(data)):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(data[:cut])


def test_unsupported_streams_quarantined_by_name():
    _, _, _, img = _tile_image(3)
    data = bytearray(jpeg.encode_jpeg(img.shape[1], img.shape[0], img.tobytes()))
    # rewrite SOF0 (FFC0) -> SOF2 (progressive)
    i = bytes(data).find(b"\xff\xc0")
    prog = bytes(data[:i]) + b"\xff\xc2" + bytes(data[i + 2:])
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg(prog)
    # 12-bit precision
    bad = bytearray(data)
    bad[i + 4] = 12  # SOF precision byte (after marker + length)
    with pytest.raises(ValueError, match="precision"):
        jpeg.decode_jpeg(bytes(bad))
    # subsampling factor 2x1 on component 0
    bad = bytearray(data)
    bad[i + 11] = 0x21
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.decode_jpeg(bytes(bad))
    # restart-interval marker injected before SOS
    j = bytes(data).find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode_jpeg(bytes(data[:j]) + dri + bytes(data[j:]))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_hostile_dimensions_rejected_before_allocation():
    _, _, _, img = _tile_image(3)
    data = bytearray(jpeg.encode_jpeg(img.shape[1], img.shape[0], img.tobytes()))
    i = bytes(data).find(b"\xff\xc0")
    # declared 2^15 x 2^15 x 3: over the decode bound
    struct.pack_into(">HH", data, i + 5, 1 << 15, 1 << 15)
    data[i + 9] = 3
    # (component spec bytes now lie, but the bound check fires first)
    with pytest.raises(ValueError, match="decode bound"):
        jpeg.decode_jpeg(bytes(data))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="pixel buffer"):
        jpeg.encode_jpeg(4, 4, bytes(3))
    with pytest.raises(ValueError, match="n_components"):
        jpeg.encode_jpeg(1, 1, bytes(2), n_components=2)


# ---------------------------------------------------------------------------
# Spark path: real decode over generated JPEG payloads
# ---------------------------------------------------------------------------

pytestmark_data = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata missing"
)


@pytest.fixture(scope="module")
def jpeg_payloads(spark):
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    return multimodal.media_payloads_jpeg(
        _media_decoded(spark, SF_DIR).limit(40)
    ).localCheckpoint()


@pytestmark_data
def test_payloads_are_real_jpegs(jpeg_payloads):
    rows = jpeg_payloads.collect()
    assert rows
    for r in rows:
        c = bytes(r["content"])
        assert c[:2] == b"\xff\xd8" and c[-2:] == b"\xff\xd9"
        d = int(r["doc_id"])
        w, h, _tiles, img = _tile_image(d)
        assert jpeg.decode_jpeg(c) == (w, h, 1, img.tobytes())


@pytestmark_data
def test_decode_media_real_sniffs_jpeg(jpeg_payloads):
    decoded = multimodal.decode_media(jpeg_payloads, decoder="real").collect()
    assert decoded
    for r in decoded:
        d = int(r["doc_id"])
        w, h, _tiles, _img = _tile_image(d)
        assert (r["width"], r["height"], r["format"]) == (w, h, "jpeg")


@pytestmark_data
def test_jpeg_pixel_stats_match_grammar(jpeg_payloads):
    got = {r["doc_id"]: r for r in multimodal.jpeg_pixel_stats(jpeg_payloads).collect()}
    assert got
    for doc_id, r in got.items():
        d = int(doc_id)
        w, h, tiles, _img = _tile_image(d)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["pixel_sum"] == 64 * int(tiles.astype(np.int64).sum())
        assert r["pixel_min"] == int(tiles.min())
        assert r["pixel_max"] == int(tiles.max())
