"""functions/wav.py — the pure-stdlib RIFF/WAVE PCM codec (audio axis).

Contracts pinned here (mirrors test_png.py / test_jpeg.py):
- PCM int16 samples round-trip BIT-EXACTLY (lossless by construction —
  the exactness contract wav_decode_stats' oracle relies on), through
  a container that forces the skip-unknown-chunk path (LIST/INFO
  between fmt and data) and RIFF odd-body padding;
- EVERY truncation point raises ValueError, never struct/IndexError
  (the quarantine contract);
- IEEE-float/A-law/mu-law/ADPCM/extensible streams, wrong bit depths,
  zero channels/rate, and block-align lies are quarantined by name;
- hostile declared sizes are rejected before any size-driven slice;
- the Spark path (media_payloads_wav -> wav_sample_stats /
  wav_energy_windows) matches the doc_id sample grammar.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from indigent_defense_stats_spark.functions import wav
from indigent_defense_stats_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


def _clip(d: int):
    nf = 256 + d % multimodal.WAV_N_MOD
    ch = 2 if d % multimodal.WAV_STEREO_EVERY == 0 else 1
    rate = 8000 * (1 + d % multimodal.WAV_RATE_MOD)
    i = np.arange(nf * ch, dtype=np.int64)
    v = (
        (d * multimodal.WAV_SAMPLE_A + i * multimodal.WAV_SAMPLE_B) % 65536
        - 32768
    ).astype("<i2")
    return rate, ch, nf, v


def test_pcm_roundtrip_bit_exact():
    for d in (0, 1, 5, 17, 123, 999, 4444):
        rate, ch, nf, v = _clip(d)
        data = wav.encode_wav(rate, ch, v.tobytes(), info=b"doc:%d" % d)
        assert wav.decode_wav(data) == (rate, ch, nf, v.tobytes())


def test_info_chunk_skip_and_odd_padding():
    # odd-length INFO body exercises the RIFF pad byte; a decoder that
    # forgets the pad desyncs the chunk walk and must NOT succeed
    v = np.arange(-4, 4, dtype="<i2")
    for info in (b"x", b"xy", b"odd comment!!", b""):
        data = wav.encode_wav(8000, 1, v.tobytes(), info=info)
        assert wav.decode_wav(data) == (8000, 1, 8, v.tobytes())
    # no INFO chunk at all
    data = wav.encode_wav(8000, 2, v.tobytes())
    assert wav.decode_wav(data) == (8000, 2, 4, v.tobytes())
    # odd-size DATA chunk is impossible for int16, but an unknown odd
    # chunk after fmt must also be walked correctly
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", 16) + fmt
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd body + pad
        + b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    )
    raw = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert wav.decode_wav(raw) == (8000, 1, 2, b"\x01\x00\x02\x00")


def test_every_truncation_point_is_valueerror():
    rate, ch, nf, v = _clip(123)
    data = wav.encode_wav(rate, ch, v.tobytes(), info=b"doc:123")
    for cut in range(len(data)):
        with pytest.raises(ValueError):
            wav.decode_wav(data[:cut])


def test_unsupported_codecs_quarantined_by_name():
    base = wav.encode_wav(8000, 1, b"\x00\x00" * 4)
    # wFormatTag lives at offset 20 (RIFF 12 + 'fmt '+size 8)
    for tag, name in [
        (3, "IEEE float"),
        (6, "A-law"),
        (7, "mu-law"),
        (2, "ADPCM"),
        (17, "ADPCM"),
        (0xFFFE, "EXTENSIBLE"),
    ]:
        b = bytearray(base)
        struct.pack_into("<H", b, 20, tag)
        with pytest.raises(ValueError, match=name):
            wav.decode_wav(bytes(b))
    for off, val, msg in [
        (34, 8, "bit depth"),     # bits per sample
        (22, 0, "channel"),       # channels
        (24, 0, "sample rate"),   # rate (4 bytes, 0 low half suffices)
        (32, 7, "block align"),   # block align lie
    ]:
        b = bytearray(base)
        struct.pack_into("<H", b, off, val)
        if off == 24:
            struct.pack_into("<I", b, off, val)
        with pytest.raises(ValueError, match=msg):
            wav.decode_wav(bytes(b))
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode_wav(b"\x89PNG\r\n\x1a\n" + bytes(8))
    with pytest.raises(ValueError, match="WAVE"):
        wav.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_hostile_declared_sizes_rejected():
    base = bytearray(wav.encode_wav(8000, 1, b"\x00\x00" * 4))
    # data chunk declaring 2 GiB: over the decode bound, checked before
    # the slice
    i = bytes(base).find(b"data")
    struct.pack_into("<I", base, i + 4, 1 << 31)
    with pytest.raises(ValueError, match="decode bound"):
        wav.decode_wav(bytes(base))
    # RIFF size overrunning the buffer
    b2 = bytearray(wav.encode_wav(8000, 1, b"\x00\x00" * 4))
    struct.pack_into("<I", b2, 4, len(b2) * 2)
    with pytest.raises(ValueError, match="declares"):
        wav.decode_wav(bytes(b2))


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="multiple"):
        wav.encode_wav(8000, 2, b"\x00\x00")  # 1 sample, 2 channels
    with pytest.raises(ValueError, match="channels"):
        wav.encode_wav(8000, 0, b"")
    with pytest.raises(ValueError, match="sample_rate"):
        wav.encode_wav(0, 1, b"")


# ---------------------------------------------------------------------------
# Spark path: real decode over generated WAV payloads
# ---------------------------------------------------------------------------

pytestmark_data = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="testdata missing"
)


@pytest.fixture(scope="module")
def wav_payloads(spark):
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    return multimodal.media_payloads_wav(
        _media_decoded(spark, SF_DIR).limit(40)
    ).localCheckpoint()


@pytestmark_data
def test_payloads_are_real_wavs(wav_payloads):
    rows = wav_payloads.collect()
    assert rows
    for r in rows:
        c = bytes(r["content"])
        assert c[:4] == b"RIFF" and c[8:12] == b"WAVE"
        d = int(r["doc_id"])
        rate, ch, nf, v = _clip(d)
        assert wav.decode_wav(c) == (rate, ch, nf, v.tobytes())


@pytestmark_data
def test_sample_stats_match_grammar(wav_payloads):
    got = {
        r["doc_id"]: r
        for r in multimodal.wav_sample_stats(wav_payloads).collect()
    }
    assert got
    for doc_id, r in got.items():
        rate, ch, nf, v = _clip(int(doc_id))
        a = v.astype(np.int64)
        assert (
            r["sample_rate"], r["channels"], r["n_frames"], r["duration_ms"],
            r["sample_sum"], r["sample_min"], r["sample_max"],
        ) == (rate, ch, nf, nf * 1000 // rate, int(a.sum()), int(a.min()),
              int(a.max()))


@pytestmark_data
def test_energy_windows_match_grammar(wav_payloads):
    rows = multimodal.wav_energy_windows(wav_payloads).collect()
    assert rows
    by_doc: dict[str, dict[int, int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["window_idx"]] = r["energy"]
    for doc_id, wins in by_doc.items():
        rate, ch, nf, v = _clip(int(doc_id))
        per = multimodal.WAV_WIN_FRAMES * ch
        n_win = nf // multimodal.WAV_WIN_FRAMES
        assert sorted(wins) == list(range(n_win))
        a = v.astype(np.int64)
        for w in range(n_win):
            assert wins[w] == int((a[w * per : (w + 1) * per] ** 2).sum())


# ---------------------------------------------------------------------------
# audio fingerprint near-dup (group-mixed grammar)
# ---------------------------------------------------------------------------


def _afp_clip(d: int) -> np.ndarray:
    import hashlib

    g = d % multimodal.AFP_GROUPS
    nf = multimodal.AFP_WINDOWS * multimodal.WAV_WIN_FRAMES
    i = np.arange(nf, dtype=np.int64)
    base = np.array(
        [
            int(hashlib.md5(f"a:{g}:{w}".encode()).hexdigest()[:15], 16)
            % 1024
            for w in range(multimodal.AFP_WINDOWS)
        ],
        dtype=np.int64,
    )
    v = base[i // multimodal.WAV_WIN_FRAMES] + i % 7
    p = (
        (g % multimodal.AFP_WINDOWS) * multimodal.WAV_WIN_FRAMES
        + d % multimodal.WAV_WIN_FRAMES
    )
    v = v.copy()
    v[p] += 1 + (d // multimodal.AFP_GROUPS) % 3
    return v


def _afp_sig(v: np.ndarray) -> int:
    e = (v.reshape(multimodal.AFP_WINDOWS, -1) ** 2).sum(axis=1)
    sig = 0
    for w in range(32):
        if e[w + 1] > e[w]:
            sig |= 1 << (31 - w)
    return sig


@pytestmark_data
def test_audio_fingerprint_matches_numpy_replay(spark):
    from indigent_defense_stats_spark.operators.pipeline_queries import (
        _media_decoded,
    )

    payloads = multimodal.media_payloads_wav_groups(
        _media_decoded(spark, SF_DIR).limit(30)
    )
    got = {
        r["doc_id"]: r["sig"]
        for r in multimodal.audio_fingerprint(payloads).collect()
    }
    assert got
    for d, sig in got.items():
        assert sig == _afp_sig(_afp_clip(int(d))), f"doc {d}"


@pytestmark_data
def test_audio_neardup_same_group_within_two_bits(spark):
    # same-group clips differ in <= 2 samples, both inside ONE window
    # -> at most the two delta bits that window touches flip ->
    # Hamming <= 2 < the 4-band pigeonhole bound (3): every true pair
    # is a candidate AND a verified match
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["audio_fingerprint_neardup"](
        spark, SF_DIR
    ).collect()
    pairs = {(r["d1"], r["d2"]): r["hamming"] for r in rows}
    assert pairs
    import pyspark.sql.functions as F

    docs = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    by_group: dict[int, list[int]] = {}
    for d in docs:
        by_group.setdefault(d % multimodal.AFP_GROUPS, []).append(d)
    n_true = 0
    for g, members in by_group.items():
        members.sort()
        for i, d1 in enumerate(members):
            for d2 in members[i + 1 :]:
                sig1 = _afp_sig(_afp_clip(d1))
                sig2 = _afp_sig(_afp_clip(d2))
                assert bin(sig1 ^ sig2).count("1") <= 2, (d1, d2)
                assert (d1, d2) in pairs, f"missed true pair {(d1, d2)}"
                n_true += 1
    assert n_true > 0


# ---------------------------------------------------------------------------
# VAD segmentation (gaps-and-islands over real decoded energies)
# ---------------------------------------------------------------------------


@pytestmark_data
def test_vad_segments_match_python_replay(spark):
    # independent replay: per-doc energies from the sample grammar,
    # strict above-mean threshold, island grouping by itertools
    import itertools

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["audio_vad_segments"](spark, SF_DIR).collect()
    got = {
        (r["doc_id"], r["seg_start"]): (
            r["seg_end"], r["n_windows"], r["seg_energy"]
        )
        for r in rows
    }
    assert got
    docs = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    expect = {}
    W = multimodal.WAV_WIN_FRAMES
    for d in docs:
        nf = 256 + d % multimodal.WAV_N_MOD
        ch = 2 if d % multimodal.WAV_STEREO_EVERY == 0 else 1
        n_win = nf // W
        i = np.arange(n_win * W * ch, dtype=np.int64)
        v = (d * multimodal.WAV_SAMPLE_A + i * multimodal.WAV_SAMPLE_B) \
            % 65536 - 32768
        e = (v.reshape(n_win, W * ch) ** 2).sum(axis=1)
        tot = int(e.sum())
        active = [int(x) * n_win > tot for x in e]
        w = 0
        for flag, grp in itertools.groupby(active):
            seg = list(grp)
            if flag:
                es = e[w : w + len(seg)]
                expect[(str(d), w)] = (
                    w + len(seg) - 1, len(seg), int(es.sum())
                )
            w += len(seg)
    assert got == expect
