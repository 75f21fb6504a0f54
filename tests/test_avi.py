"""functions/avi.py — the pure-stdlib MJPEG-AVI container codec
(video axis; frames decoded by functions/jpeg.py).

Contracts pinned here (mirrors test_png.py / test_jpeg.py /
test_wav.py):
- flat-tile MJPEG frames round-trip BIT-EXACTLY through the container
  + JPEG chain (the exactness contract avi_frame_stats' oracle relies
  on);
- the idx1 index is required and VERIFIED: a lying offset/size/fourcc
  quarantines instead of silently trusting either side;
- EVERY truncation point raises ValueError, never struct/IndexError;
- non-MJPG codecs, non-vids streams, audio chunks, and multi-stream
  files are quarantined by name;
- hostile declared sizes are rejected before any size-driven slice;
- the Spark path (media_payloads_avi -> avi_frame_table -> native
  frame_idx filter -> mjpeg_frame_stats) matches the (doc_id, frame)
  tile grammar.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from indigent_defense_stats_spark.functions import avi, jpeg
from indigent_defense_stats_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


def _clip(d: int):
    bw = 1 + d % multimodal.JPEG_BW_MOD
    bh = 1 + (d // multimodal.JPEG_BW_MOD) % multimodal.JPEG_BW_MOD
    nfr = 2 + d % multimodal.AVI_NFRAMES_MOD
    frames, imgs = [], []
    for f in range(nfr):
        tiles = (
            (
                d * multimodal.JPEG_TILE_A
                + f * multimodal.AVI_FRAME_C
                + np.arange(bw * bh) * multimodal.JPEG_TILE_B
            )
            % 256
        ).astype(np.uint8)
        img = np.kron(tiles.reshape(bh, bw), np.ones((8, 8), dtype=np.uint8))
        frames.append(jpeg.encode_jpeg(bw * 8, bh * 8, img.tobytes()))
        imgs.append(img)
    return bw * 8, bh * 8, frames, imgs


def test_mjpeg_roundtrip_bit_exact():
    for d in (0, 1, 5, 17, 123, 999):
        w, h, frames, imgs = _clip(d)
        data = avi.encode_avi_mjpeg(w, h, multimodal.AVI_FPS, frames)
        gw, gh, fps, out = avi.decode_avi_mjpeg(data)
        assert (gw, gh, fps, len(out)) == (w, h, multimodal.AVI_FPS,
                                           len(frames))
        for f, fr in enumerate(out):
            dw, dh, nc, px = jpeg.decode_jpeg(fr)
            assert (dw, dh, nc) == (w, h, 1)
            assert px == imgs[f].tobytes(), f"doc {d} frame {f}"


def test_every_truncation_point_is_valueerror():
    w, h, frames, _ = _clip(7)
    data = avi.encode_avi_mjpeg(w, h, 12, frames)
    for cut in range(len(data)):
        with pytest.raises(ValueError):
            avi.decode_avi_mjpeg(data[:cut])


def _sample() -> bytes:
    w, h, frames, _ = _clip(5)
    return avi.encode_avi_mjpeg(w, h, 12, frames)


def test_unsupported_codecs_quarantined_by_name():
    data = _sample()
    # fccHandler XVID (strh)
    b = bytearray(data)
    i = bytes(b).find(b"MJPG")
    b[i : i + 4] = b"XVID"
    with pytest.raises(ValueError, match="XVID"):
        avi.decode_avi_mjpeg(bytes(b))
    # biCompression DIB (strf; second MJPG occurrence)
    b = bytearray(data)
    j = bytes(b).find(b"MJPG", i + 4)
    b[j : j + 4] = b"DIB "
    with pytest.raises(ValueError, match="biCompression"):
        avi.decode_avi_mjpeg(bytes(b))
    # auds stream type
    b = bytearray(data)
    k = bytes(b).find(b"vids")
    b[k : k + 4] = b"auds"
    with pytest.raises(ValueError, match="vids"):
        avi.decode_avi_mjpeg(bytes(b))
    # wrong containers
    with pytest.raises(ValueError, match="RIFF"):
        avi.decode_avi_mjpeg(b"\x89PNG\r\n\x1a\n" + bytes(8))
    with pytest.raises(ValueError, match="AVI"):
        avi.decode_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_lying_index_quarantined():
    data = _sample()
    i = bytes(data).find(b"idx1")
    # offset lie
    b = bytearray(data)
    struct.pack_into("<I", b, i + 8 + 8, 9999)
    with pytest.raises(ValueError, match="disagrees"):
        avi.decode_avi_mjpeg(bytes(b))
    # size lie
    b = bytearray(data)
    struct.pack_into("<I", b, i + 8 + 12, 1)
    with pytest.raises(ValueError, match="disagrees"):
        avi.decode_avi_mjpeg(bytes(b))
    # entry-count lie: truncate idx1 by one 16-byte entry
    b = bytearray(data)
    size = struct.unpack_from("<I", b, i + 4)[0]
    struct.pack_into("<I", b, i + 4, size - 16)
    trimmed = bytes(b[: i + 8 + size - 16])
    struct.pack_into("<I", b, 4, len(trimmed) - 8)
    trimmed = bytes(b[:4]) + struct.pack("<I", len(trimmed) - 8) + bytes(
        b[8 : i + 8 + size - 16]
    )
    with pytest.raises(ValueError, match="entries"):
        avi.decode_avi_mjpeg(trimmed)


def test_hostile_declared_sizes_rejected():
    data = bytearray(_sample())
    i = bytes(data).find(b"00dc")
    struct.pack_into("<I", data, i + 4, 1 << 31)
    with pytest.raises(ValueError, match="decode bound|declares"):
        avi.decode_avi_mjpeg(bytes(data))
    b2 = bytearray(_sample())
    struct.pack_into("<I", b2, 4, len(b2) * 2)
    with pytest.raises(ValueError, match="declares"):
        avi.decode_avi_mjpeg(bytes(b2))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="frame"):
        avi.encode_avi_mjpeg(8, 8, 12, [])
    with pytest.raises(ValueError, match="SOI"):
        avi.encode_avi_mjpeg(8, 8, 12, [b"not a jpeg"])
    with pytest.raises(ValueError, match="fps"):
        avi.encode_avi_mjpeg(8, 8, 0, [b"\xff\xd8\xff\xd9"])


# ---------------------------------------------------------------------------
# Spark path: real demux + decode over generated AVI payloads
# ---------------------------------------------------------------------------

pytestmark_data = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata missing"
)


@pytest.fixture(scope="module")
def avi_payloads(spark):
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    return multimodal.media_payloads_avi(
        _media_decoded(spark, SF_DIR).limit(30)
    ).localCheckpoint()


@pytestmark_data
def test_payloads_are_real_avis(avi_payloads):
    rows = avi_payloads.collect()
    assert rows
    for r in rows:
        c = bytes(r["content"])
        assert c[:4] == b"RIFF" and c[8:12] == b"AVI "
        d = int(r["doc_id"])
        w, h, _frames, imgs = _clip(d)
        gw, gh, fps, out = avi.decode_avi_mjpeg(c)
        assert (gw, gh, fps, len(out)) == (w, h, multimodal.AVI_FPS,
                                           len(imgs))


@pytestmark_data
def test_decode_media_real_sniffs_riff_formats(avi_payloads, spark):
    # the unified real decoder covers all three modalities by magic:
    # AVI reports (width, height); WAV reports (n_frames, channels)
    rows = multimodal.decode_media(avi_payloads, decoder="real").collect()
    assert rows
    for r in rows:
        d = int(r["doc_id"])
        w, h, _frames, _imgs = _clip(d)
        assert (r["format"], r["width"], r["height"]) == ("avi", w, h)
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    wavs = multimodal.media_payloads_wav(
        _media_decoded(spark, SF_DIR).limit(10)
    )
    for r in multimodal.decode_media(wavs, decoder="real").collect():
        d = int(r["doc_id"])
        assert r["format"] == "wav"
        assert r["width"] == 256 + d % multimodal.WAV_N_MOD
        assert r["height"] == (
            2 if d % multimodal.WAV_STEREO_EVERY == 0 else 1
        )


@pytestmark_data
def test_frame_table_and_sampled_stats_match_grammar(avi_payloads, spark):
    import pyspark.sql.functions as F

    frames = multimodal.avi_frame_table(avi_payloads)
    sampled = frames.filter(
        F.col("frame_idx") % multimodal.AVI_SAMPLE_EVERY == 0
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in multimodal.mjpeg_frame_stats(sampled).collect()
    }
    assert got
    docs = {r["doc_id"] for r in avi_payloads.select("doc_id").collect()}
    expected_keys = set()
    for doc_id in docs:
        d = int(doc_id)
        w, h, _frames, imgs = _clip(d)
        for f in range(0, len(imgs), multimodal.AVI_SAMPLE_EVERY):
            expected_keys.add((doc_id, f))
            r = got[(doc_id, f)]
            a = imgs[f].astype(np.int64)
            assert (
                r["width"], r["height"], r["pixel_sum"],
                r["pixel_min"], r["pixel_max"],
            ) == (w, h, int(a.sum()), int(a.min()), int(a.max()))
    assert set(got) == expected_keys


# ---------------------------------------------------------------------------
# video temporal near-dup (group-mixed grammar)
# ---------------------------------------------------------------------------


def _vnp_tiles(d: int, f: int) -> np.ndarray:
    import hashlib

    nt = multimodal.VID_GRID * multimodal.VID_GRID
    g = d % multimodal.VID_GROUPS
    tiles = np.array(
        [
            8
            + int(hashlib.md5(f"m:{g}:{f}:{k}".encode()).hexdigest()[:15], 16)
            % 240
            for k in range(nt)
        ],
        dtype=np.int64,
    )
    if f == d % multimodal.VID_FRAMES:
        k1 = (d // multimodal.VID_FRAMES) % nt
        k2 = (k1 + 1 + (d // 64) % (nt - 1)) % nt
        delta = 1 + (d // multimodal.VID_GROUPS) % 7
        tiles = tiles.copy()
        tiles[k1] += delta
        tiles[k2] -= delta
    return tiles


def _vnp_sig(d: int) -> list[int]:
    nt = multimodal.VID_GRID * multimodal.VID_GRID
    out = []
    for f in range(multimodal.VID_FRAMES):
        t = _vnp_tiles(d, f)
        h = 0
        s = int(t.sum())
        for k in range(nt):
            if int(t[k]) * nt > s:
                h |= 1 << (nt - 1 - k)
        out.append(h)
    return out


@pytestmark_data
def test_video_ahash_matches_numpy_replay(spark):
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    payloads = multimodal.media_payloads_avi_groups(
        _media_decoded(spark, SF_DIR).limit(25)
    )
    cells = multimodal.frame_cell_sums(multimodal.avi_frame_table(payloads))
    got = {
        r["doc_id"]: list(r["fh"])
        for r in multimodal.video_ahash(cells).collect()
    }
    assert got
    for d, fh in got.items():
        assert fh == _vnp_sig(int(d)), f"doc {d}"


@pytestmark_data
def test_video_neardup_sum_preserving_recall(spark):
    # the perturbation is SUM-PRESERVING inside one frame, so only the
    # two perturbed tiles' bits can flip: same-group signatures differ
    # in <= 4 bits across <= 2 frames -> >= 2 of the 4 frame-hash
    # bands identical -> every true pair is a candidate AND verifies
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["video_ahash_neardup"](spark, SF_DIR).collect()
    pairs = {(r["d1"], r["d2"]): r["hamming"] for r in rows}
    assert pairs
    import pyspark.sql.functions as F  # noqa: F401

    docs = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    by_group: dict[int, list[int]] = {}
    for d in docs:
        by_group.setdefault(d % multimodal.VID_GROUPS, []).append(d)
    n_true = 0
    for g, members in by_group.items():
        members.sort()
        for i, d1 in enumerate(members):
            for d2 in members[i + 1 :]:
                s1, s2 = _vnp_sig(d1), _vnp_sig(d2)
                ham = sum(bin(a ^ b).count("1") for a, b in zip(s1, s2))
                assert ham <= 2 * 2, (d1, d2)
                shared = sum(a == b for a, b in zip(s1, s2))
                assert shared >= 2, (d1, d2)
                assert (d1, d2) in pairs, f"missed true pair {(d1, d2)}"
                n_true += 1
    assert n_true > 0


@pytestmark_data
def test_shot_transitions_match_signature_replay(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["video_shot_transitions"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        fh = _vnp_sig(int(r["doc_id"]))
        ham = bin(
            fh[r["frame_idx"]] ^ fh[r["frame_idx"] - 1]
        ).count("1")
        assert r["hamming_prev"] == ham
        assert r["is_cut"] == (ham > multimodal.VID_CUT_T)
    # every doc contributes exactly VID_FRAMES - 1 transitions
    per_doc: dict[str, int] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert set(per_doc.values()) == {multimodal.VID_FRAMES - 1}


@pytestmark_data
def test_frame_motion_matches_tile_replay(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["video_frame_motion"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        d = int(r["doc_id"])
        bw = 1 + d % multimodal.JPEG_BW_MOD
        bh = 1 + (d // multimodal.JPEG_BW_MOD) % multimodal.JPEG_BW_MOD
        nfr = 2 + d % multimodal.AVI_NFRAMES_MOD
        motion = changed = 0
        for f in range(1, nfr):
            for k in range(bw * bh):
                a = (
                    d * multimodal.JPEG_TILE_A
                    + f * multimodal.AVI_FRAME_C
                    + k * multimodal.JPEG_TILE_B
                ) % 256
                b = (
                    d * multimodal.JPEG_TILE_A
                    + (f - 1) * multimodal.AVI_FRAME_C
                    + k * multimodal.JPEG_TILE_B
                ) % 256
                motion += 64 * abs(a - b)
                changed += 64 * (a != b)
        assert r["n_transitions"] == nfr - 1
        assert r["motion_total"] == motion
        assert r["changed_px_total"] == changed
        assert r["px_total"] == (nfr - 1) * bw * bh * 64


@pytestmark_data
def test_av_alignment_fraction_complete(spark):
    # independent ground truth in exact rational seconds: enumerate
    # EVERY (VAD segment, shot) pair from python replays of both
    # chains and check true overlap with fractions.Fraction — pins
    # both directions (no false pair, no missed pair), so a flipped
    # inequality that the SQL oracle would mirror still fails here
    import itertools
    from fractions import Fraction

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["av_segment_alignment"](
        spark, SF_DIR
    ).collect()
    got = {
        (r["doc_id"], r["seg_start"], r["shot_start"]): r["overlap_units"]
        for r in rows
    }
    assert got
    docs = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    W = multimodal.WAV_WIN_FRAMES
    fps = multimodal.AVI_FPS
    expect = {}
    for d in docs:
        # audio side: VAD islands (as in tests/test_wav.py)
        nf = 256 + d % multimodal.WAV_N_MOD
        ch = 2 if d % multimodal.WAV_STEREO_EVERY == 0 else 1
        ra = 8000 * (1 + d % multimodal.WAV_RATE_MOD)
        n_win = nf // W
        i = np.arange(n_win * W * ch, dtype=np.int64)
        v = (d * multimodal.WAV_SAMPLE_A + i * multimodal.WAV_SAMPLE_B) \
            % 65536 - 32768
        e = (v.reshape(n_win, W * ch) ** 2).sum(axis=1)
        tot = int(e.sum())
        active = [int(x) * n_win > tot for x in e]
        segs, w = [], 0
        for flag, grp in itertools.groupby(active):
            n = len(list(grp))
            if flag:
                segs.append((w, w + n - 1))
            w += n
        # video side: shots from cut flags
        fh = _vnp_sig(d)
        cuts = [
            f
            for f in range(1, multimodal.VID_FRAMES)
            if bin(fh[f] ^ fh[f - 1]).count("1") > multimodal.VID_CUT_T
        ]
        bounds = [0] + cuts + [multimodal.VID_FRAMES]
        shots = list(zip(bounds[:-1], bounds[1:]))
        for (s0, s1), (v0, v1) in itertools.product(segs, shots):
            a_lo, a_hi = Fraction(s0 * W, ra), Fraction((s1 + 1) * W, ra)
            b_lo, b_hi = Fraction(v0, fps), Fraction(v1, fps)
            if a_lo < b_hi and b_lo < a_hi:
                ov = min(a_hi, b_hi) - max(a_lo, b_lo)
                expect[(str(d), s0, v0)] = int(ov * ra * fps)
    assert got == expect
