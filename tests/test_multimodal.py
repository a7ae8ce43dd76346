"""Multimodal plumbing: feature extraction + frame sampling through
mapInPandas (deterministic stand-in kernels, real batch contracts)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sql_engine_triangle_spark.catalog import load_table
from sql_engine_triangle_spark.operators import multimodal as MM
from tests.conftest import SF_DIR_SMALL


def _assets(spark):
    return MM.docs_as_assets(load_table(spark, SF_DIR_SMALL, "documents"))


def test_extract_features_contract(spark):
    feats = MM.extract_features(_assets(spark)).collect()
    assert len(feats) == 500
    for r in feats[:20]:
        assert len(r.feature) == MM.FEATURE_DIM
        v = np.array(r.feature)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5  # unit-normalized
    # Determinism across runs.
    again = MM.extract_features(_assets(spark)).collect()
    assert [r.feature for r in feats] == [r.feature for r in again]


def test_sample_frames_fanout(spark):
    frames = MM.sample_frames(_assets(spark), n_frames=4)
    pdf = frames.toPandas()
    per_doc = pdf.groupby("doc_id").size()
    assert (per_doc <= 4).all() and (per_doc >= 1).all()
    assert (pdf["n_bytes"] > 0).all()
    # Frame bytes must reassemble a prefix of the source payload.
    one = pdf[pdf.doc_id == pdf.doc_id.iloc[0]].sort_values("frame_idx")
    src = _assets(spark).filter(F.col("doc_id") == int(one.doc_id.iloc[0])).head().content
    joined = b"".join(bytes(b) for b in one.frame_bytes)
    assert bytes(src).startswith(joined[: len(joined) // 2])


def test_feature_similarity_composes_with_ann(spark):
    """The extracted features are a valid embedding column: feed them
    through the brute-force cosine top-k operator (composition of the
    multimodal and similarity surfaces)."""
    from sql_engine_triangle_spark.operators import similarity

    feats = MM.extract_features(_assets(spark)).withColumnRenamed(
        "doc_id", "vec_id"
    ).withColumn("label", F.lit(0))
    q = [float(x) for x in feats.filter(F.col("vec_id") == 0).head().feature]
    top = similarity.brute_force_topk(feats.withColumnRenamed("feature", "embedding"), q, k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r.cos_sim <= 1.0001 for r in rows)


def test_ppm_decode_roundtrip_and_stats(spark):
    """REAL image decode: synthetic PPM payloads built per doc_id,
    decoded inside mapInPandas; per-channel means must equal the
    numpy reference on the source arrays bit-for-bit (same float64
    accumulation), and decode(encode(x)) == x."""
    import numpy as np

    rng_imgs = {}
    rows = []
    for doc_id in range(6):
        h, w = 4 + doc_id, 5 + doc_id
        # deterministic pixels from doc_id — no RNG in tests
        img = (np.arange(h * w * 3, dtype=np.int64) * (doc_id + 7) % 256).astype(
            np.uint8
        ).reshape(h, w, 3)
        rng_imgs[doc_id] = img
        rows.append((doc_id, "image/x-portable-pixmap", bytearray(MM.encode_ppm(img))))
    assert (MM.decode_ppm(MM.encode_ppm(rng_imgs[0])) == rng_imgs[0]).all()

    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {r.doc_id: r for r in MM.image_stats(assets).collect()}
    for doc_id, img in rng_imgs.items():
        r = got[doc_id]
        assert (r.height, r.width) == img.shape[:2]
        want = img.reshape(-1, 3).mean(axis=0)
        assert abs(r.mean_r - want[0]) < 1e-5
        assert abs(r.mean_g - want[1]) < 1e-5
        assert abs(r.mean_b - want[2]) < 1e-5


def test_wav_decode_roundtrip_and_stats(spark):
    """REAL audio decode: PCM16 WAV payloads parsed inside
    mapInPandas; RMS must match the numpy reference."""
    import numpy as np

    rows, ref = [], {}
    for doc_id in range(4):
        n = 64 + 32 * doc_id
        samples = (
            (np.arange(n, dtype=np.int64) * (doc_id + 3) * 257) % 20001 - 10000
        ).astype(np.int16)
        ref[doc_id] = samples
        rows.append((doc_id, "audio/wav", bytearray(MM.encode_wav_pcm16(samples, 8000))))
    rate, back = MM.decode_wav_pcm16(MM.encode_wav_pcm16(ref[0], 8000))
    assert rate == 8000 and (back == ref[0]).all()

    assets = spark.createDataFrame(rows, MM.ASSET_SCHEMA)
    got = {r.doc_id: r for r in MM.audio_stats(assets).collect()}
    for doc_id, samples in ref.items():
        r = got[doc_id]
        assert r.sample_rate == 8000
        assert r.n_samples == len(samples)
        x = samples.astype(np.float64)
        want = float(np.sqrt(np.mean(x * x)))
        # rms rides a FloatType column — compare at float32 precision
        assert abs(r.rms - want) <= 1e-6 * max(1.0, abs(want)) * 128


def test_ppm_decode_malformed_payloads():
    """Malformed PPM payloads must raise, not hang or mis-shape:
    truncated header, whitespace-free header, truncated pixel data.
    '#' comment lines (legal PPM) must be skipped."""
    import pytest

    ok = MM.encode_ppm(np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3))
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n3 2")  # header cut mid-field
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P63")  # no whitespace after magic, then EOF
    with pytest.raises(ValueError):
        MM.decode_ppm(ok[:-4])  # pixel data short
    commented = b"P6\n# a comment line\n3 2\n# another\n255\n" + ok.split(b"255\n", 1)[1]
    assert (MM.decode_ppm(commented) == MM.decode_ppm(ok)).all()


def test_wav_decode_leading_junk_chunk():
    """A legal WAV whose first chunk is JUNK (padding before 'fmt ')
    must decode identically to the plain layout."""
    import struct

    samples = (np.arange(48, dtype=np.int64) * 997 % 9001 - 4500).astype(np.int16)
    plain = MM.encode_wav_pcm16(samples, 8000)
    junk = b"JUNK" + struct.pack("<I", 5) + b"\x00" * 5 + b"\x00"  # odd len → pad byte
    with_junk = plain[:12] + junk + plain[12:]
    # fix RIFF size field for the inserted chunk
    with_junk = (
        with_junk[:4]
        + struct.pack("<I", len(with_junk) - 8)
        + with_junk[8:]
    )
    rate, back = MM.decode_wav_pcm16(with_junk)
    assert rate == 8000 and (back == samples).all()


def test_image_dhash_matches_independent_reference(spark):
    """dHash over hand-built PPM payloads equals an independent
    per-pixel reference (mean-pooling + nested-loop bit pack written
    from the definition, not shared with the operator) — catches a
    transposed reshape, a swapped shift axis, or a sign-flipped
    comparison."""
    rng = np.random.RandomState(7)
    payloads = {}
    for doc_id in range(6):
        cells = rng.randint(0, 256, size=(7, 9)).astype(np.uint8)
        arr = np.zeros((28, 36, 3), dtype=np.uint8)
        for y in range(7):
            for x in range(9):
                arr[y * 4 : y * 4 + 4, x * 4 : x * 4 + 4, 0] = cells[y, x]
        payloads[doc_id] = (cells, MM.encode_ppm(arr))

    df = spark.createDataFrame(
        [(i, "image/ppm", bytearray(p)) for i, (_, p) in payloads.items()],
        schema=MM.ASSET_SCHEMA,
    )
    got = {r.doc_id: r.phash for r in MM.image_dhash(df).collect()}
    for doc_id, (cells, _) in payloads.items():
        expect = 0
        for y in range(7):
            for x in range(8):
                # mean over a constant block is the cell value itself
                if int(cells[y, x + 1]) > int(cells[y, x]):
                    expect |= 1 << (y * 8 + x)
        assert got[doc_id] == expect, f"doc {doc_id}"


def test_texture_assets_group_structure(spark):
    """synthesize_texture_assets: same-group docs are near-dup images
    (pair dHash Hamming <= 4 by the two-single-cell-flip argument),
    different groups decorrelate (Hamming concentrated near 28 —
    assert > 6, the entry threshold)."""
    docs = spark.range(48).withColumnRenamed("id", "doc_id")
    ph = {
        r.doc_id: r.phash
        for r in MM.image_dhash(MM.synthesize_texture_assets(docs)).collect()
    }
    for a in range(48):
        for b in range(a + 1, 48):
            ham = bin(ph[a] ^ ph[b]).count("1")
            if a // 16 == b // 16:
                assert ham <= 4, f"in-group pair ({a},{b}) hamming {ham}"
            else:
                assert ham > 6, f"cross-group pair ({a},{b}) hamming {ham}"


def test_audio_fingerprint_matches_independent_reference(spark):
    """audio_fingerprint over hand-built WAV payloads equals an
    independent reference (per-frame mean |amplitude| comparison —
    valid because frames are constant-amplitude, so any monotone
    energy statistic orders identically) — catches frame-boundary,
    shift-axis, and sign errors."""
    rng = np.random.RandomState(11)
    payloads = {}
    for doc_id in range(5):
        amps = rng.randint(0, 251, size=57).astype(np.int64)
        samples = np.repeat(amps, 64).astype(np.int16)
        payloads[doc_id] = (amps, MM.encode_wav_pcm16(samples, 16000))
    df = spark.createDataFrame(
        [(i, "audio/wav", bytearray(p)) for i, (_, p) in payloads.items()],
        schema=MM.ASSET_SCHEMA,
    )
    got = {r.doc_id: r.afp for r in MM.audio_fingerprint(df).collect()}
    for doc_id, (amps, _) in payloads.items():
        expect = 0
        for f in range(56):
            if int(amps[f + 1]) > int(amps[f]):
                expect |= 1 << f
        assert got[doc_id] == expect, f"doc {doc_id}"


def test_tone_assets_group_structure(spark):
    """synthesize_tone_assets: same-group clips are near-dups (pair
    fingerprint Hamming <= 4 — two single-frame perturbations), other
    groups decorrelate past the entry's <= 6 threshold."""
    docs = spark.range(48).withColumnRenamed("id", "doc_id")
    fp = {
        r.doc_id: r.afp
        for r in MM.audio_fingerprint(MM.synthesize_tone_assets(docs)).collect()
    }
    for a in range(48):
        for b in range(a + 1, 48):
            ham = bin(fp[a] ^ fp[b]).count("1")
            if a // 16 == b // 16:
                assert ham <= 4, f"in-group pair ({a},{b}) hamming {ham}"
            else:
                assert ham > 6, f"cross-group pair ({a},{b}) hamming {ham}"


def test_ppm_stream_decode_and_truncation():
    """decode_ppm_stream walks concatenated P6 frames with the same
    header parser as the single-image path; a trailing partial frame
    raises instead of yielding fewer frames."""
    import pytest

    f1 = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    f2 = (f1 + 100).astype(np.uint8)
    payload = MM.encode_ppm(f1) + MM.encode_ppm(f2)
    frames = MM.decode_ppm_stream(payload)
    assert len(frames) == 2
    assert (frames[0] == f1).all() and (frames[1] == f2).all()
    with pytest.raises(ValueError):
        MM.decode_ppm_stream(payload[:-5])  # truncated second frame
    with pytest.raises(ValueError):
        MM.decode_ppm_stream(payload + b"P6\n")  # dangling header


def test_video_scene_stats_crafted_boundary(spark):
    """Scene segmentation pinned on HAND-CRAFTED frames, independent
    of the synthetic payload law: three flat frames where only the
    middle transition exceeds the per-pixel-32 threshold."""
    levels = [10, 20, 90, 95]  # deltas: 10, 70, 5 per pixel
    frames = b"".join(
        MM.encode_ppm(np.full((MM.VIDEO_H, MM.VIDEO_W, 3), v, dtype=np.uint8))
        for v in levels
    )
    assets = spark.createDataFrame(
        [(7, "video/x-ppm-stream", bytearray(frames))],
        schema=MM.ASSET_SCHEMA,
    )
    row = MM.video_scene_stats(assets).head()
    px = MM.VIDEO_W * MM.VIDEO_H
    assert row.n_frames == 4
    assert row.n_scenes == 2  # one cut, at frame 2
    assert row.keyframe_sum == 2
    assert row.total_sad == (10 + 70 + 5) * px
    assert row.max_sad == 70 * px


def test_video_assets_scene_law(spark):
    """The synthetic clips obey the documented margins: within-scene
    SAD <= 819, boundary SAD >= 4851 — decoded with an independent
    numpy walk, not the operator under test."""
    docs = load_table(spark, SF_DIR_SMALL, "documents").limit(40)
    rows = MM.synthesize_video_assets(docs).collect()
    assert len(rows) == 40
    for r in rows:
        i = r.doc_id
        frames = MM.decode_ppm_stream(bytes(r.content))
        assert len(frames) == 8 + i % 5
        seg = 3 + i % 3
        reds = [f[..., 0].astype(np.int64) for f in frames]
        for f in range(1, len(reds)):
            sad = int(np.abs(reds[f] - reds[f - 1]).sum())
            if f % seg == 0:
                assert sad >= 4851
            else:
                assert sad <= 819


def test_video_keyframe_dhash_matches_independent_reference(spark):
    """Keyframe dHash pinned against an independent numpy pipeline
    (synthesize in python -> full-stream decode -> green channel ->
    comparison bits), NOT the operator's random-access parser, plus
    the group structure: within-group Hamming <= 4."""
    docs = load_table(spark, SF_DIR_SMALL, "documents").limit(64)
    assets = MM.synthesize_video_assets(docs)
    got = {r.doc_id: r.phash for r in MM.video_keyframe_dhash(assets).collect()}
    payloads = {r.doc_id: bytes(r.content) for r in assets.collect()}
    hashes = {}
    for i, pl in payloads.items():
        frame0 = MM.decode_ppm_stream(pl)[0]
        gchan = frame0[..., 1].astype(np.int64)
        h, w = gchan.shape
        assert (w, h) == (MM.VIDEO_W, MM.VIDEO_H)
        bits = gchan[:, 1:] > gchan[:, :-1]
        shifts = np.arange(h)[:, None] * 8 + np.arange(w - 1)[None, :]
        hashes[i] = int((bits.astype(np.int64) << shifts).sum())
    assert got == hashes
    # group structure: same-group pairs are Hamming-near
    ids = sorted(hashes)
    for a in ids:
        for b in ids:
            if a < b and a // 16 == b // 16:
                assert bin(hashes[a] ^ hashes[b]).count("1") <= 4
