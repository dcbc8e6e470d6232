"""Structured Streaming topology (stream == batch equivalence,
foreachBatch ingest) and multimodal binary plumbing."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from rag_database_spark.operators import multimodal
from rag_database_spark.streaming import events as se

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """A small event parquet directory the file-source stream reads."""
    path = str(tmp_path_factory.mktemp("events_src"))
    from rag_database_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "events").limit(500).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_stream_matches_batch(spark, event_dir):
    q = se.stream_hourly_to_memory(spark, event_dir, "hourly_test")
    q.awaitTermination(120)
    streamed = spark.sql(
        "SELECT bucket_start, event_type, n_events, sum_value "
        "FROM hourly_test"
    ).collect()
    batch = se.hourly_event_agg(
        spark.read.parquet(event_dir), exact_users=False
    ).select("bucket_start", "event_type", "n_events", "sum_value").collect()
    key = lambda r: (r["bucket_start"], r["event_type"])
    sm = {key(r): (r["n_events"], r["sum_value"]) for r in streamed}
    bm = {key(r): (r["n_events"], r["sum_value"]) for r in batch}
    assert sm == bm and len(sm) > 0


def test_watermark_is_applied(spark, event_dir):
    stream = se.with_watermark(se.read_event_stream(spark, event_dir))
    assert stream.isStreaming
    # the watermark column survives into the windowed plan
    agg = se.hourly_event_agg(stream, exact_users=False)
    assert "bucket_start" in agg.columns


def test_stream_ingest_documents(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    dst = str(tmp_path / "chunks_out")
    from rag_database_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "documents").limit(20).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    q = se.stream_ingest_documents(
        spark, src, dst, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    )
    q.awaitTermination(120)
    out = spark.read.parquet(dst)
    assert out.count() > 20  # ≥1 paragraph chunk + 1 doc chunk per doc
    assert {"chunk_id", "level", "page_number"} <= set(out.columns)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"x" * 1000, "image"),
        (2, b"y" * 2048, "video"),
        (3, b"", "audio"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary, kind string")
    return multimodal.media_table(df, "id", "payload", "mixed").drop(
        "kind"
    ).join(
        spark.createDataFrame(
            [(1, "image"), (2, "video"), (3, "audio")], "media_id long, kind string"
        ),
        "media_id",
    )


def test_decode_stub_schema_and_determinism(spark, media):
    a = {r["media_id"]: tuple(r) for r in multimodal.decode_media(media).collect()}
    b = {r["media_id"]: tuple(r) for r in multimodal.decode_media(media).collect()}
    assert a == b
    assert a[1][2] == 1000  # n_bytes
    assert a[3][6] is False  # empty payload → ok=False


def test_frame_sample_flatmap(spark, media):
    frames = multimodal.frame_sample(media, every_n=2).collect()
    vid = [r for r in frames if r["media_id"] == 2]
    # 2048 bytes → 8 frames of 256, every 2nd → indices 0,2,4,6
    assert [r["frame_index"] for r in sorted(vid, key=lambda r: r["frame_index"])] == [0, 2, 4, 6]
    assert all(r["n_bytes"] == 256 for r in vid)


def test_resize_media_clamp_math(spark):
    """Stub-path resize: dims come from the md5 pseudo-decode, the
    clamp is integer-exact aspect-preserving (new_w = w*max_side //
    max(w, h)), small images pass through payload-untouched, and the
    stub 'resample' crops the payload to the new pixel budget."""
    import hashlib

    p1 = b"payload one bytes" * 100
    p2 = b"x"
    media = spark.createDataFrame(
        [(1, "image", p1, {}), (2, "image", p2, {})],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r
        for r in multimodal.resize_media(media, max_side=256).collect()
    }
    for mid, payload in ((1, p1), (2, p2)):
        h = hashlib.md5(payload).digest()
        w0, h0 = 64 + h[0] % 1920, 64 + h[1] % 1080
        longer = max(w0, h0)
        if longer > 256:
            nw, nh = w0 * 256 // longer, h0 * 256 // longer
        else:
            nw, nh = w0, h0
        r = got[mid]
        assert (r["width"], r["height"]) == (w0, h0)
        assert (r["new_width"], r["new_height"]) == (nw, nh)
        assert r["resized"] == ((nw, nh) != (w0, h0))
        want_payload = payload[: nw * nh] if r["resized"] else payload
        assert bytes(r["payload"]) == want_payload


def test_resize_one_real_pil_branch(monkeypatch):
    """The real-PIL branch of _resize_one opens, clamps, and resizes
    via PIL — pinned against a recorded fake (same direct-call pattern
    as _real_decode; executor monkeypatching can't cross workers)."""
    import sys
    import types

    calls = {}

    class _Im:
        width, height = 2048, 512

        def resize(self, size):
            calls["size"] = size
            return self

        def tobytes(self):
            return b"resized-bytes"

    fake_img = types.ModuleType("PIL.Image")
    fake_img.open = lambda bio: _Im()
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_img
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_img)

    out = multimodal._resize_one(b"\x89PNGxxxx", "image", 1024, True)
    # 2048x512 clamps to 1024x256 (aspect preserved, integer-exact)
    assert out == (2048, 512, 1024, 256, True, b"resized-bytes")
    assert calls["size"] == (1024, 256)
    # already-small image: untouched payload, no resize call
    _Im.width, _Im.height = 640, 480
    calls.clear()
    out2 = multimodal._resize_one(b"\x89PNGxxxx", "image", 1024, True)
    assert out2 == (640, 480, 640, 480, False, b"\x89PNGxxxx")
    assert "size" not in calls


def test_audio_fingerprint_hand_case(spark):
    """Energy-delta fingerprint == an independent hashlib recompute;
    identical payloads collide at hamming 0 via the banded join."""
    import hashlib

    from rag_database_spark.operators import dedup as dd

    t1 = b"some pseudo audio payload bytes here" * 8
    t2 = b"other waveform content entirely different" * 8
    media = spark.createDataFrame(
        [(1, "audio", t1, {}), (2, "audio", t2, {}), (3, "audio", t1, {})],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r["audio_fp"]
        for r in multimodal.audio_fingerprint(media).collect()
    }

    def expect(payload):
        n = multimodal.AUDIO_FP_FRAMES
        w = (len(payload) + n - 1) // n
        e = [
            int(hashlib.md5(payload[i * w: i * w + w]).hexdigest()[:2], 16)
            for i in range(n)
        ]
        fp = 0
        for i in range(n - 1):
            if e[i + 1] > e[i]:
                fp |= 1 << i
        return fp

    assert got[1] == expect(t1) and got[2] == expect(t2)
    assert got[1] == got[3] and got[1] != got[2]

    fps = multimodal.audio_fingerprint(media).select(
        F.col("media_id").alias("doc_id"),
        F.col("audio_fp").alias("simhash"),
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(
            fps, 5, bits=multimodal.AUDIO_FP_FRAMES - 1
        ).collect()
    }
    assert pairs == {(1, 3): 0}


def test_real_frame_energies_rms_and_volume_invariance(monkeypatch):
    """The real branch computes per-frame RMS over mono-mixed PCM via
    the soundfile seam (recorded fake), and the delta-sign fingerprint
    is invariant to volume scaling — the Haitsma-Kalker property the
    energy-DELTA construction exists for."""
    import math
    import sys
    import types

    wave = [0.1, 0.2, 0.4, 0.8, 0.4, 0.2, 0.1, 0.05]

    def fake_read(bio):
        return list(wave), 16000

    fake_sf = types.ModuleType("soundfile")
    fake_sf.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)

    n = 4  # 2 samples per frame
    e = multimodal._real_frame_energies(b"fake-wav", n)
    want = [
        math.sqrt((a * a + b * b) / 2)
        for a, b in zip(wave[0::2], wave[1::2])
    ]
    assert all(abs(x - y) < 1e-12 for x, y in zip(e, want))

    def fp(energies):
        out = 0
        for i in range(len(energies) - 1):
            if energies[i + 1] > energies[i]:
                out |= 1 << i
        return out

    fake_sf.read = lambda bio: ([2.0 * v for v in wave], 16000)
    e2 = multimodal._real_frame_energies(b"fake-wav", n)
    assert fp(e2) == fp(e)  # volume doubled, deltas' signs unchanged


def test_video_frame_jaccard_hand_case(spark):
    """Frame-set Jaccard over sampled frames: two 'videos' sharing
    half their sampled frames get exactly the hand-computed Jaccard;
    an unrelated video pairs with neither."""
    from rag_database_spark.operators import dedup as dd

    fb, en = 4, 1  # 4-byte frames, sample every frame
    shared = b"AAAABBBBCCCCDDDD"          # frames A B C D
    v1 = shared + b"EEEEFFFF"             # A B C D E F
    v2 = shared + b"GGGGHHHH"             # A B C D G H  -> inter 4, union 8
    v3 = b"XXXXYYYYZZZZWWWW"              # disjoint
    media = spark.createDataFrame(
        [(1, "video", v1, {}), (2, "video", v2, {}), (3, "video", v3, {})],
        multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.frame_sample(media, every_n=en, frame_bytes=fb)
    ex = frames.select(
        F.col("media_id").alias("doc_id"), F.md5(F.col("frame")).alias("s")
    ).distinct()
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.shingle_jaccard_pairs(
            None, 0.4, shingle_index=ex
        ).collect()
    }
    assert pairs == {(1, 2): 0.5}


def test_image_dhash_hand_case(spark):
    """dHash fingerprint == an independent hashlib recompute of the
    length-scaled md5 pixel grid + adjacent-cell comparisons; exact
    duplicate payloads collide at hamming 0 via the banded pair
    join and a distinct payload does not pair with them."""
    import hashlib

    from rag_database_spark.operators import dedup as dd

    t1 = b"the quick brown fox jumps over the lazy dog" * 4
    t2 = b"completely different content with other bytes here" * 4
    media = spark.createDataFrame(
        [(1, "image", t1, {}), (2, "image", t2, {}), (3, "image", t1, {})],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r["media_id"]: r["dhash"]
        for r in multimodal.image_dhash(media).collect()
    }

    def expect(payload):
        n_cells = multimodal.DHASH_ROWS * (multimodal.DHASH_COLS + 1)
        w = (len(payload) + n_cells - 1) // n_cells
        px = [
            int(hashlib.md5(payload[i * w: i * w + w]).hexdigest()[:2], 16)
            for i in range(n_cells)
        ]
        fp = 0
        for r in range(multimodal.DHASH_ROWS):
            for c in range(multimodal.DHASH_COLS):
                row0 = r * (multimodal.DHASH_COLS + 1)
                if px[row0 + c + 1] > px[row0 + c]:
                    fp |= 1 << (r * multimodal.DHASH_COLS + c)
        return fp

    assert got[1] == expect(t1) and got[2] == expect(t2)
    assert got[1] == got[3] and got[1] != got[2]

    fps = multimodal.image_dhash(media).select(
        F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash")
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_pairs(
            fps, 5, bits=multimodal.DHASH_BITS
        ).collect()
    }
    assert pairs == {(1, 3): 0}


def test_media_embedding_shape(spark, media):
    rows = multimodal.media_embedding(media).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["embedding"]) == multimodal.EMBED_DIM
        assert all(-1.0 <= v < 1.0 for v in r["embedding"])


def test_stateful_sessionization_matches_batch(spark, event_dir):
    batch = se.sessionize(spark.read.parquet(event_dir)).collect()
    stream = se.sessionize_stream(
        se.read_event_stream(spark, event_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM sessions_test").collect()
    key = lambda r: (r["user_id"], r["session_start"])
    b = {key(r): (r["n_events"], r["session_end"]) for r in batch}
    s = {key(r): (r["n_events"], r["session_end"]) for r in streamed}
    # single availableNow micro-batch sees all events → sessions agree
    assert s == b and len(s) > 0


def test_stream_dedup(spark, tmp_path):
    import pyspark.sql.functions as F
    src = str(tmp_path / "dup_events")
    base = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5, "click", 1.0, "{}"),
         (2, "2024-01-01 10:01:00", 6, "view", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    base.unionAll(base).write.mode("overwrite").parquet(src)  # duplicates
    q = (
        se.dedup_events_stream(se.read_event_stream(spark, src))
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_test").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_native_session_window_agrees(spark, event_dir):
    events = spark.read.parquet(event_dir)
    mine = se.sessionize(events).collect()
    native = se.sessionize_native(events).collect()
    key = lambda r: (r["user_id"], r["session_start"])
    a = {key(r): (r["n_events"], r["total_value"]) for r in mine}
    b = {key(r): (r["n_events"], r["total_value"]) for r in native}
    # random microsecond timestamps never land exactly on the gap
    # boundary, so the two formulations partition events identically
    assert a == b and len(a) > 0


def test_stream_stream_join_matches_batch_candidates(spark, event_dir):
    """The stream-stream interval join must emit exactly the batch
    join's candidate pairs (the last-touch pick runs downstream)."""
    batch_events = spark.read.parquet(event_dir)
    clicks = se.read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = se.read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        se.attribute_conversions_stream(clicks, purchases)
        .writeStream.format("memory")
        .queryName("conv_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM conv_test").collect()
    }

    c = batch_events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = batch_events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c_us = F.unix_micros(F.col("click_ts"))
    p_us = F.unix_micros(F.col("purchase_ts"))
    batch = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(c, "user_id")
        .filter((c_us <= p_us) & (c_us > p_us - se.ATTRIBUTION_WINDOW_US))
        .collect()
    }
    assert streamed == batch and streamed


def test_conversions_last_touch(spark):
    """Hand case: the latest in-window click wins; out-of-window and
    clickless purchases drop."""
    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 0.0, ""),
        (2, "2024-01-01 10:30:00", 7, "click", 0.0, ""),
        (3, "2024-01-01 10:45:00", 7, "purchase", 9.5, ""),
        (4, "2024-01-01 08:00:00", 8, "click", 0.0, ""),
        (5, "2024-01-01 10:00:00", 8, "purchase", 1.0, ""),  # click too old
        (6, "2024-01-01 10:00:00", 9, "purchase", 2.0, ""),  # no click
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["purchase_id"]: r["click_id"]
        for r in se.attribute_conversions(events).collect()
    }
    assert got == {3: 2}


def test_sessionize_stream_expire_state_matches_batch(spark, event_dir):
    """expire_state=True (EventTimeTimeout) must not change emitted
    sessions — it only bounds state retention."""
    stream = se.sessionize_stream(
        se.with_watermark(se.read_event_stream(spark, event_dir)),
        expire_state=True,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_expire_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sess_expire_test").collect()
    }
    batch = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in se.sessionize(spark.read.parquet(event_dir)).collect()
    }
    assert streamed == batch and streamed


def test_stream_dedup_gate_quarantines_and_learns(spark, tmp_path):
    """Two micro-batches: batch 1 bootstraps the corpus+index; batch 2
    holds a near-dup of an accepted doc (quarantined with its match)
    and a fresh doc (accepted and indexed)."""
    import time as _time

    from rag_database_spark.operators import dedup as dd

    src = str(tmp_path / "gate_src")
    accept = str(tmp_path / "gate_accept")
    quarantine = str(tmp_path / "gate_quarantine")
    index = str(tmp_path / "gate_index")
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven eight"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # distinct mod-times pin micro-batch order
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta"),  # dup of 1
            (11, "completely fresh new document text content here"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    q = se.stream_dedup_gate(
        spark, src, accept, quarantine, schema, index,
        threshold=0.8, max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    accepted = {r["doc_id"] for r in spark.read.parquet(accept).collect()}
    assert accepted == {1, 2, 11}
    quar = spark.read.parquet(quarantine).collect()
    assert [(r["doc_id"], r["match_id"], r["best_jaccard"]) for r in quar] \
        == [(10, 1, 1.0)]
    # the index holds shingles for accepted docs only
    idx_ids = {
        r["doc_id"]
        for r in dd.read_shingle_index(spark, index)
        .select("doc_id").distinct().collect()
    }
    assert idx_ids == {1, 2, 11}


def test_stream_gate_maintains_pair_index(spark, tmp_path):
    """With pair_path the gate's online pair maintenance must leave
    the artifact equal to a full shingle_jaccard_pairs rebuild over
    everything it accepted — across the bootstrap batch (within-slice
    only) and a later batch (cross + within via append_pair_index)."""
    import time as _time

    from rag_database_spark.operators import dedup as dd

    src = str(tmp_path / "src")
    accept = str(tmp_path / "accept")
    quarantine = str(tmp_path / "quar")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    schema = "doc_id long, text string"
    dup = "the quick brown fox jumps over the lazy dog daily "
    spark.createDataFrame(
        [(1, dup * 3), (2, dup * 3 + "small tail variation one two")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(
        [
            (10, dup * 3),  # exact dup of 1 -> quarantined
            (11, dup * 2 + "different continuation text entirely here now"),
            (12, "unrelated fresh content with other words only"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    q = se.stream_dedup_gate(
        spark, src, accept, quarantine, schema, index,
        threshold=0.9, max_files_per_trigger=1,
        pair_path=pairs, pair_threshold=0.3,
    )
    q.awaitTermination(120)

    accepted_df = spark.read.parquet(accept).select("doc_id", "text")
    online = sorted(map(tuple, dd.read_pair_index(spark, pairs).collect()))
    rebuilt = sorted(
        map(tuple, dd.shingle_jaccard_pairs(accepted_df, 0.3).collect())
    )
    assert online == rebuilt
    assert len(rebuilt) > 0  # the 1-2 and cross 11 pairs exist


def test_gate_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch body
    with the same batch_id must leave every artifact (accept,
    quarantine, pairs, shingle index) EXACTLY as after the first run —
    no double-appended rows, and no self-matches at jaccard 1.0 from
    the replay probing its own already-written shingles."""
    from rag_database_spark.operators import dedup as dd

    accept = str(tmp_path / "accept")
    quarantine = str(tmp_path / "quar")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    schema = "doc_id long, text string"
    dup = "the quick brown fox jumps over the lazy dog daily "
    batch0 = spark.createDataFrame(
        [(1, dup * 3), (2, "unrelated seed corpus words only here now")],
        schema,
    )
    batch1 = spark.createDataFrame(
        [
            (10, dup * 3),  # near-dup of 1 -> quarantined
            (11, dup * 2 + "different continuation text entirely here"),
            (12, "fresh second batch document with new content words"),
        ],
        schema,
    )

    def run(df, bid):
        se.dedup_gate_batch(
            df, bid, accept, quarantine, index, 0.9,
            pair_path=pairs, pair_threshold=0.3,
        )

    import os

    def snapshot():
        def rows(path, reader=spark.read.parquet):
            if not os.path.exists(path):
                return []
            return sorted(map(tuple, reader(path).collect()))

        return {
            "accept": rows(accept),
            "quar": rows(quarantine),
            "pairs": rows(pairs, lambda p: dd.read_pair_index(spark, p)),
            "index": rows(
                index, lambda p: dd.read_shingle_index(spark, p)
            ),
        }

    # Structured Streaming replays only the LATEST uncommitted batch,
    # so replay each batch while it is the newest slice.
    run(batch0, 0)
    boot = snapshot()
    run(batch0, 0)  # replayed bootstrap
    assert snapshot() == boot

    run(batch1, 1)
    first = snapshot()
    assert {t[0] for t in first["accept"]} == {1, 2, 11, 12}
    assert {t[0] for t in first["quar"]} == {10}

    run(batch1, 1)  # replayed batch 1 (same batch_id)
    assert snapshot() == first

    # and the online pair artifact still equals a full rebuild
    accepted_df = spark.read.parquet(accept).select("doc_id", "text")
    rebuilt = sorted(
        map(tuple, dd.shingle_jaccard_pairs(accepted_df, 0.3).collect())
    )
    assert first["pairs"] == rebuilt


def test_funnel_requires_strict_order(spark):
    """A user whose click precedes their first view does NOT reach
    step 2; a correctly-ordered user converts through all steps; the
    rates are exact."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def ev(i, user, kind, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), user, kind, 1.0, "{}")

    rows = [
        # user 1: view -> click -> purchase (full conversion)
        ev(1, 1, "view", 0), ev(2, 1, "click", 5), ev(3, 1, "purchase", 10),
        # user 2: click BEFORE first view -> stops at step 1
        ev(4, 2, "click", 0), ev(5, 2, "view", 5),
        # user 3: view only
        ev(6, 3, "view", 0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["step"]: r for r in se.funnel(events).collect()}
    assert got["view"]["n_users"] == 3 and got["view"]["conversion"] == 1.0
    assert got["click"]["n_users"] == 1
    assert abs(got["click"]["conversion"] - round(1 / 3, 6)) < 1e-9
    assert got["purchase"]["n_users"] == 1


def test_cohort_retention_triangle(spark):
    """Two cohorts a week apart: offsets count from each user's own
    first week and users are distinct within a cell."""
    import datetime as dt

    mon1 = dt.datetime(2024, 1, 1, 10, 0, 0)   # Monday
    mon2 = dt.datetime(2024, 1, 8, 10, 0, 0)
    rows = [
        (1, mon1, 1, "view", 1.0, "{}"),
        (2, mon1 + dt.timedelta(days=1), 1, "view", 1.0, "{}"),  # same week
        (3, mon2, 1, "view", 1.0, "{}"),                          # offset 1
        (4, mon2, 2, "view", 1.0, "{}"),                          # cohort 2
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in se.cohort_retention(events).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_stream_funnel_matches_batch(spark, event_dir):
    """Single availableNow micro-batch (event-time-complete input):
    the streaming funnel's per-user snapshot reproduces the batch
    funnel's per-step totals exactly."""
    batch = {
        r["step_idx"]: r["n_users"]
        for r in se.funnel(spark.read.parquet(event_dir)).collect()
    }
    q = (
        se.funnel_stream(se.read_event_stream(spark, event_dir))
        .writeStream.format("memory")
        .queryName("funnel_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = spark.sql("SELECT * FROM funnel_test").collect()
    reached = {r["user_id"]: r["steps_reached"] for r in snap}
    got = {
        i: sum(1 for n in reached.values() if n >= i)
        for i in (1, 2, 3)
    }
    assert got == batch and got[1] > 0


def test_funnel_conversion_window(spark):
    """within_us caps the step-to-step gap: a click 2h after the view
    is outside a 1h window (user stops at step 1), inside a 3h one."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=2), 1, "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    hour_us = 3600 * 1_000_000
    tight = {r["step"]: r["n_users"]
             for r in se.funnel(events, within_us=hour_us).collect()}
    loose = {r["step"]: r["n_users"]
             for r in se.funnel(events, within_us=3 * hour_us).collect()}
    assert tight == {"view": 1, "click": 0, "purchase": 0}
    assert loose == {"view": 1, "click": 1, "purchase": 0}


def test_events_cube_granularities(spark):
    """CUBE emits all four granularities with the gid bitmask
    (event_type = MSB), and each rollup level sums consistently."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 9, 30)
    rows = [
        (1, t, 1, "view", 2.0, "{}"),
        (2, t, 2, "click", 3.0, "{}"),
        (3, t + dt.timedelta(hours=1), 1, "view", 5.0, "{}"),
    ]
    from rag_database_spark.operators.relational import events_cube

    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_cube(events).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    total = by_gid[3][0]
    assert (total["n_events"], total["sum_value"]) == (3, 10.0)
    assert total["event_type"] is None and total["bucket_start"] is None
    per_type = {r["event_type"]: r for r in by_gid[1]}
    assert per_type["view"]["n_events"] == 2
    assert per_type["view"]["sum_value"] == 7.0
    assert sum(r["n_events"] for r in by_gid[0]) == 3
    assert sum(r["n_events"] for r in by_gid[2]) == 3


def test_funnel_is_order_and_partition_invariant(spark):
    """The batch funnel is min-based, so input row order and
    partitioning must not change any step count (the determinism the
    oracle hash-compare relies on)."""
    events = se.read_event_stream  # noqa: F841 (keep import surface)
    from rag_database_spark.sources.tables import load_table

    base = load_table(spark, SF_DIR, "events").limit(2000)
    want = sorted(map(tuple, se.funnel(base).collect()))
    shuffled = base.orderBy(F.desc("event_id")).repartition(13)
    got = sorted(map(tuple, se.funnel(shuffled).collect()))
    assert got == want


def test_slice_reader_handles_mixed_flat_and_partitioned_layout(
    spark, tmp_path
):
    """Upgrading a live stream in place leaves the old gate's flat
    part-files at the index root NEXT TO the new gate's
    ingest_batch=N partition dirs; one spark.read.parquet(root) throws
    'Conflicting directory structures' on that mix, so the slice
    reader must load the halves separately and union them (the flat
    half is standing corpus — never batch-excluded)."""
    from rag_database_spark.operators import dedup as dd

    path = str(tmp_path / "index")
    # legacy flat append (pre-upgrade gate)
    spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "doc_id long, s string"
    ).write.mode("append").parquet(path)
    # new-gate batch slices on the same root
    dd._write_slice(
        spark.createDataFrame([(3, "cc")], "doc_id long, s string"),
        path,
        batch_id=7,
    )
    dd._write_slice(
        spark.createDataFrame([(4, "dd")], "doc_id long, s string"),
        path,
        batch_id=8,
    )
    got = sorted(
        map(tuple, dd.read_shingle_index(spark, path).collect())
    )
    assert got == [(1, "aa"), (2, "bb"), (3, "cc"), (4, "dd")]
    # excluding a batch drops exactly that slice; flat rows stay
    got7 = sorted(
        map(
            tuple,
            dd.read_shingle_index(spark, path, exclude_batch=7).collect(),
        )
    )
    assert got7 == [(1, "aa"), (2, "bb"), (4, "dd")]


def test_use_real_pins_the_seam_branch(monkeypatch):
    """Entries whose payloads are synthesized from text pass
    real=False: even when the library is importable, the real decoder
    must not run on bytes that were never real media."""
    from rag_database_spark import seams

    monkeypatch.setattr(seams, "have", lambda name: True)
    assert multimodal._use_real(None, "PIL.Image") is True  # auto
    assert multimodal._use_real(False, "PIL.Image") is False  # pinned
    monkeypatch.setattr(seams, "have", lambda name: False)
    assert multimodal._use_real(None, "PIL.Image") is False
    assert multimodal._use_real(True, "PIL.Image") is True


def _vecs_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_stream_vector_gate_quarantines_and_learns(spark, tmp_path):
    """Vector twin of the dedup gate: batch 1 bootstraps the vector
    index; batch 2 holds a near-identical embedding (quarantined with
    its match + cosine) and an orthogonal one (accepted, indexed)."""
    src = str(tmp_path / "vgate_src")
    accept = str(tmp_path / "vgate_accept")
    quarantine = str(tmp_path / "vgate_quar")
    index = str(tmp_path / "vgate_index")
    schema = "vec_id long, embedding array<float>"
    _vecs_df(
        spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _vecs_df(
        spark,
        [(10, [0.999, 0.01, 0.0]), (11, [0.0, 0.0, 1.0])],
    ).coalesce(1).write.mode("append").parquet(src)

    q = se.stream_vector_gate(
        spark, src, accept, quarantine, schema, index,
        threshold=0.95, max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    accepted = {r["vec_id"] for r in spark.read.parquet(accept).collect()}
    assert accepted == {1, 2, 11}
    quar = spark.read.parquet(quarantine).collect()
    assert [(r["vec_id"], r["match_id"]) for r in quar] == [(10, 1)]
    assert quar[0]["best_cosine"] > 0.99
    from rag_database_spark.operators import dedup as dd

    idx_ids = {
        r["vec_id"]
        for r in dd._read_slices(spark, index, ["vec_id"]).collect()
    }
    assert idx_ids == {1, 2, 11}


def test_vector_gate_replay_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch body with the same batch_id leaves
    accept/quarantine/index byte-identical: slices overwrite in place
    and the probe excludes the batch's own already-written vectors
    (no self-match at cosine 1.0)."""
    import os

    accept = str(tmp_path / "accept")
    quarantine = str(tmp_path / "quar")
    index = str(tmp_path / "index")
    batch0 = _vecs_df(
        spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]
    )
    batch1 = _vecs_df(
        spark,
        [(10, [0.999, 0.01, 0.0]), (11, [0.0, 0.0, 1.0])],
    )

    def run(df, bid):
        se.vector_gate_batch(
            df, bid, accept, quarantine, index, threshold=0.95
        )

    def snapshot():
        out = {}
        for name, path in (
            ("accept", accept), ("quar", quarantine), ("index", index)
        ):
            if not os.path.exists(path):
                out[name] = []
                continue
            out[name] = sorted(
                map(tuple, spark.read.parquet(path).collect())
            )
        return out

    run(batch0, 0)
    boot = snapshot()
    run(batch0, 0)  # replayed bootstrap
    assert snapshot() == boot

    run(batch1, 1)
    first = snapshot()
    assert {t[0] for t in first["accept"]} == {1, 2, 11}
    run(batch1, 1)  # replayed second batch
    assert snapshot() == first
