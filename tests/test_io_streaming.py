"""Sources / sinks / streaming / multimodal surface tests (SURVEY §2.1-2.2,
§2.9): URI-dispatched reads, write round-trips, chunked result streaming,
incremental MV folding, event-time windows, and the mapInPandas multimodal
plumbing with stubbed codecs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_read_auto_parquet_and_format_inference(spark):
    from chdb_spark.sources import read_auto

    df = read_auto(spark, os.path.join(SF_SMOKE, "orders.parquet"))
    assert df.count() > 0
    assert "o_orderkey" in df.columns


def test_csv_json_orc_roundtrip(spark, tmp_path):
    from chdb_spark.sinks import write_auto
    from chdb_spark.sources import read_auto

    src = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "s", "v"])
    for fmt in ["csv", "json", "orc", "parquet"]:
        path = str(tmp_path / f"rt_{fmt}")
        write_auto(src, path, fmt)
        back = read_auto(spark, path, fmt=fmt)
        assert back.count() == 2, fmt
        got = {tuple(r) for r in back.select("id", "s").collect()}
        assert got == {(1, "a"), (2, "b")}, fmt


def test_numbers_and_generate_random(spark):
    from chdb_spark.sources import generate_random, numbers

    n = numbers(spark, 100)
    assert n.columns == ["number"]
    assert n.agg(F.sum("number")).first()[0] == 4950

    g = generate_random(spark, {"x": "double", "y": "int", "s": "string"}, 50, seed=7)
    assert g.count() == 50
    assert set(g.columns) == {"x", "y", "s"}
    # deterministic per seed
    g2 = generate_random(spark, {"x": "double", "y": "int", "s": "string"}, 50, seed=7)
    assert g.collect() == g2.collect()


def test_from_pandas_and_arrow(spark):
    import pandas as pd
    import pyarrow as pa

    from chdb_spark.sources import from_arrow, from_pandas

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    assert from_pandas(spark, pdf).count() == 3
    assert from_arrow(spark, pa.Table.from_pandas(pdf)).count() == 3


def test_create_table_view_and_mv(spark, tmp_path):
    from chdb_spark.sinks import create_materialized_view, create_view

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    create_view(spark, "tv_x", df)
    assert spark.sql("SELECT sum(v) FROM tv_x").first()[0] == 30.0

    mv = create_materialized_view(spark, "mv_x", df.groupBy().agg(F.sum("v").alias("s")),
                                  str(tmp_path / "mv_x"))
    assert spark.sql("SELECT s FROM mv_x").first()[0] == 30.0
    assert mv.count() == 1


def test_stream_result_chunks(spark):
    from chdb_spark.streaming import stream_result

    df = spark.range(1000).withColumnRenamed("id", "n")
    chunks = list(stream_result(df, max_rows_per_chunk=300))
    assert sum(len(c) for c in chunks) == 1000
    assert max(len(c) for c in chunks) <= 300
    # early termination: taking one chunk must not materialize everything
    it = stream_result(spark.range(10_000_000).withColumnRenamed("id", "n"), 100)
    first = next(it)
    assert len(first) == 100


def test_windowed_counts_batch(spark):
    from chdb_spark.queries import table
    from chdb_spark.streaming import windowed_counts

    ev = table(spark, SF_SMOKE, "events")
    out = windowed_counts(ev, window="1 day", keys=["event_type"])
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
    assert {"win_start", "win_end", "event_type", "n_events", "sum_value"} == set(out.columns)


def test_session_windows_batch(spark):
    from chdb_spark.streaming import session_windows

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (1, "2024-01-01 12:00:00"),
        ],
        ["user_id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = session_windows(df, gap="30 minutes").orderBy("sess_start").collect()
    assert len(out) == 2
    assert out[0].n_events == 2 and out[1].n_events == 1


def test_materialized_view_stream_incremental(spark, tmp_path):
    from chdb_spark.streaming import materialized_view_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.mode("append").parquet(src)

    agg = lambda df: df.groupBy().agg(F.count("*").alias("n"))  # noqa: E731
    materialized_view_stream(spark, src, agg, out, ckpt)
    n1 = spark.read.parquet(out).agg(F.sum("n")).first()[0]
    assert n1 == 10

    # new files land → second invocation folds ONLY the delta
    spark.range(5).selectExpr("id + 100 AS id", "id AS v").write.mode("append").parquet(src)
    materialized_view_stream(spark, src, agg, out, ckpt)
    n2 = spark.read.parquet(out).agg(F.sum("n")).first()[0]
    assert n2 == 15


def test_multimodal_image_decode_plumbing(spark):
    from chdb_spark.multimodal import MEDIA_SCHEMA, decode_images

    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", {"src": "cam0"}),
        (2, "image", b"\x89PNG-fake-bytes-22", "image/png", {"src": "cam1"}),
        (3, "audio", b"RIFF-fake", "audio/wav", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = decode_images(media).orderBy("media_id").collect()
    assert [r.media_id for r in feats] == [1, 2]  # audio row filtered out
    assert all(r.width >= 64 and r.height >= 64 for r in feats)
    assert feats[0].n_bytes == len(b"\x89PNG-fake-bytes-1")


def test_ppm_codec_roundtrip():
    """encode_ppm produces a valid P6 payload and decode_ppm recovers the
    exact dims + integer-sum luma; non-PPM bytes return None (fallback)."""
    from chdb_spark.multimodal import decode_ppm, encode_ppm, ppm_dims

    for mid in (0, 7, 63, 199):
        payload = encode_ppm(mid)
        w, h = ppm_dims(mid)
        assert payload.startswith(f"P6\n{w} {h}\n255\n".encode())
        got = decode_ppm(payload)
        assert got is not None
        gw, gh, luma = got
        assert (gw, gh) == (w, h)
        assert 0.0 <= luma <= 255.0
    assert decode_ppm(b"\x89PNG-not-a-ppm") is None
    assert decode_ppm(b"") is None
    assert decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 5) is None  # truncated


def test_multimodal_video_and_audio_plumbing(spark):
    from chdb_spark.multimodal import MEDIA_SCHEMA, audio_features, sample_video_frames

    rows = [
        (1, "video", b"", "video/mp4", {"duration_s": "5"}),
        (2, "audio", b"\x00" * 64000, "audio/wav", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_video_frames(media, every_n_seconds=1.0).collect()
    assert len(frames) == 5
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == list(range(5))

    audio = audio_features(media).collect()
    assert len(audio) == 1
    assert audio[0].est_duration_s == pytest.approx(2.0)


def test_readstream_windowed_to_memory_sink(spark):
    """True end-to-end Structured Streaming: file-source readStream over the
    events table → watermarked tumbling window → memory sink (complete
    mode), then assert the streamed totals equal the batch computation."""
    from chdb_spark.queries import table
    from chdb_spark.streaming import read_events_stream, windowed_counts

    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    windowed = windowed_counts(stream, window="1 day", keys=["event_type"])
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_events) FROM win_sink").first()[0]
    expected = table(spark, SF_SMOKE, "events").count()
    assert got == expected


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    feed the same keys in two files, one file per trigger, and check the
    state accumulates (second update for a key sees the first's totals)."""
    import pandas as pd

    from chdb_spark.streaming import stateful_running_totals

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], ["user_id", "value"]
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], ["user_id", "value"]
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_running_totals(stream, key="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql("SELECT * FROM state_sink").toPandas()
    # last update per user reflects the accumulated state over all files
    final = pdf.sort_values("n_events").groupby("user_id").last()
    assert final.loc[1, "total"] == 17.0 and final.loc[1, "n_events"] == 3
    assert final.loc[2, "total"] == 4.0 and final.loc[2, "n_events"] == 2


def test_drop_duplicates_within_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark evicts per-key state once the
    watermark passes it: a key whose state expired is EMITTED AGAIN when
    it reappears (the bounded-state trade sm7 documents), while a key
    whose state is still live keeps suppressing duplicates."""
    import glob
    import os
    import time as _time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")

    def write_batch(rows):
        before = set(glob.glob(os.path.join(src, "*.parquet")))
        spark.createDataFrame(rows, ["k", "ts_s"]).selectExpr(
            "k", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)
        return set(glob.glob(os.path.join(src, "*.parquet"))) - before

    # batch 1: key 1 early (will expire), key 2 late (stays live);
    # watermark AFTER this batch = 01-20 - 5d = 01-15
    b1 = write_batch([(1, "2024-01-01 00:00:00"), (2, "2024-01-20 00:00:00")])
    # batch 2: state purge runs at batch END, so this batch exists to let
    # the purge see watermark 01-15 and evict key 1 (expired 01-06);
    # watermark after = 01-16
    b2 = write_batch([(3, "2024-01-21 00:00:00")])
    # batch 3: key 1 again, state evicted -> RE-EMITTED; key 2 again,
    # state live (expires 01-25) -> suppressed
    b3 = write_batch([(1, "2024-01-17 00:00:00"), (2, "2024-01-19 00:00:00")])
    # file source processes oldest-mtime first — pin the order explicitly
    now = _time.time()
    for i, files in enumerate((b1, b2, b3)):
        for f in files:
            os.utime(f, (now - 60 + 10 * i, now - 60 + 10 * i))

    stream = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dd = stream.withWatermark("ts", "5 days").dropDuplicatesWithinWatermark(
        ["k"]
    )
    q = (
        dd.writeStream.format("memory")
        .queryName("ddww_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pdf = spark.sql("SELECT k FROM ddww_sink").toPandas()
    counts = pdf.groupby("k").size().to_dict()
    assert counts == {1: 2, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# URI dispatch + Python Data Source (reference uri_parser.py / PyReader)
# ---------------------------------------------------------------------------


def test_open_uri_local_and_file_scheme(spark):
    from chdb_spark.sources import open_uri

    path = os.path.join(SF_SMOKE, "region.parquet")
    assert open_uri(spark, path).count() == 5
    assert open_uri(spark, f"file://{path}").count() == 5


def test_open_uri_http_download(spark, tmp_path):
    """Drive the URL route end-to-end over a real local HTTP server."""
    import http.server
    import threading

    from chdb_spark.sources import open_uri

    src = os.path.join(SF_SMOKE, "region.parquet")
    serve_dir = str(tmp_path)
    import shutil

    shutil.copy(src, os.path.join(serve_dir, "region.parquet"))
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(*a, directory=serve_dir, **kw)  # noqa: E731
    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        df = open_uri(spark, f"http://127.0.0.1:{port}/region.parquet")
        assert df.count() == 5
    finally:
        httpd.shutdown()


def test_open_uri_jdbc_requires_table(spark):
    from chdb_spark.sources import open_uri

    with pytest.raises(ValueError, match="table"):
        open_uri(spark, "mysql://host/db")


def test_open_uri_unknown_scheme(spark):
    from chdb_spark.sources import open_uri

    with pytest.raises(ValueError, match="unsupported URI scheme"):
        open_uri(spark, "gopher://nope/x")


def test_py_reader_datasource_partitioned(spark):
    """Custom Python reader as a Spark 4 data source: the generator runs
    sharded across executor tasks (one instance per partition), not on the
    driver — the PyReader/Python() table-function analogue."""
    from chdb_spark.sources import PyReader, from_py_reader

    class SquaresReader(PyReader):
        def schema(self):
            return "n int, sq long, part int"

        def read(self, partition_index, n_partitions):
            for n in range(partition_index, 100, n_partitions):
                yield (n, n * n, partition_index)

    df = from_py_reader(spark, "squares", SquaresReader, n_partitions=4)
    rows = df.collect()
    assert len(rows) == 100
    assert {r["part"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["sq"] for r in rows) == sum(n * n for n in range(100))


def test_multimodal_pil_path_when_codecs_present(spark):
    """Real-codec switch: when PIL is installed the decode path must use it
    for non-PPM payloads (exercised the moment the environment provides
    codecs; skipped in codec-less containers)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from chdb_spark.multimodal import MEDIA_SCHEMA, _HAVE_CODECS, decode_images

    assert _HAVE_CODECS is True
    buf = io.BytesIO()
    Image.fromarray(np.full((5, 9, 3), 100, dtype=np.uint8)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue(), "image/png", {})], MEDIA_SCHEMA
    )
    r = decode_images(media).collect()[0]
    assert (r.width, r.height) == (9, 5)
    assert abs(r.mean_luma - 100.0) < 0.01


def test_multimodal_fake_path_without_codecs():
    """The deterministic fallback stays active when PIL is absent."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — fake path not reachable")
    except ImportError:
        pass
    from chdb_spark.multimodal import _HAVE_CODECS, _fake_decode_image

    assert _HAVE_CODECS is False
    w, h, luma = _fake_decode_image(b"\x89PNG-fake")
    assert w >= 64 and h >= 64 and luma >= 0.0


def test_streaming_rst_examples_verbatim(spark):
    """docs/streaming.rst:20-75 — context manager, fetch() loop, early
    termination, chunk.rows_read()."""
    from chdb_spark.stateful import Session

    sess = Session(spark=spark)
    try:
        rows_cnt = 0
        with sess.send_query("SELECT * FROM numbers(200000)", "CSV") as stream_result:
            for chunk in stream_result:
                rows_cnt += chunk.rows_read()
        assert rows_cnt == 200000

        rows_cnt = 0
        stream_result = sess.send_query("SELECT * FROM numbers(200000)", "CSV")
        while True:
            chunk = stream_result.fetch()
            if chunk is None:
                break
            rows_cnt += chunk.rows_read()
        assert rows_cnt == 200000
        stream_result.close()

        # early termination: first chunk only, then close()
        rows_cnt = 0
        stream_result = sess.send_query("SELECT * FROM numbers(200000)", "CSV")
        while True:
            chunk = stream_result.fetch()
            if chunk is None:
                break
            rows_cnt += chunk.rows_read()
            if rows_cnt > 0:
                stream_result.close()
                break
        assert 0 < rows_cnt < 200000
        # rows_read matches the physical chunk payload
        assert chunk.count(b"\n") == chunk.rows_read()
    finally:
        sess.close()


def test_streaming_rst_record_batch_reader(spark):
    """docs/streaming.rst:175-205 — Arrow RecordBatchReader with custom
    batch size over a streaming result."""
    from chdb_spark.stateful import Session

    sess = Session(spark=spark)
    try:
        stream_result = sess.send_query("SELECT * FROM numbers(100000)", "Arrow")
        batch_reader = stream_result.record_batch(rows_per_batch=10000)
        total_rows = 0
        sizes = []
        for batch in batch_reader:
            total_rows += batch.num_rows
            sizes.append(batch.num_rows)
            assert batch.num_columns == 1
        assert total_rows == 100000
        assert max(sizes) <= 10000
        stream_result.close()

        # chunk.data() on a text stream (docs/streaming.rst:118)
        with sess.send_query("SELECT number FROM numbers(3)", "CSV") as sr:
            text = "".join(c.data() for c in sr)
        assert text.strip().splitlines() == ["0", "1", "2"]
    finally:
        sess.close()


def test_resize_images_real_nearest_neighbor(spark):
    """multimodal.resize_images: genuinely downscales the P6 pixel plane
    (numpy sampling), emits valid P6 the decoder round-trips."""
    from chdb_spark.multimodal import decode_ppm, encode_ppm, resize_images

    rows = [(i, "image", encode_ppm(i)) for i in range(40, 56)]  # up to 32px
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in resize_images(media, max_side=8).collect()}
    assert len(out) == 16
    for mid, r in out.items():
        dec = decode_ppm(bytes(r["payload"]))
        assert dec is not None, mid
        w, h, luma = dec
        assert (w, h) == (r["width"], r["height"])
        assert max(w, h) <= 8
        assert 0 <= luma <= 255
    # at least some sources were bigger than 8px → actually resized
    assert any(r["resized"] for r in out.values())
    # non-P6 payloads pass through unresized
    junk = spark.createDataFrame(
        [(1, "image", b"\x00\x01\x02")], "media_id long, kind string, payload binary"
    )
    r = resize_images(junk).collect()[0]
    assert r["resized"] is False and bytes(r["payload"]) == b"\x00\x01\x02"


def test_resize_images_header_edge_cases(spark):
    """ADVICE r4: resize must derive the pixel offset from the parsed
    header, not by searching for a literal b'255\\n' — a dims line ending
    in 255 (height=255) false-matched, and space-separated headers (valid
    P6, accepted by decode_ppm) crashed the whole job."""
    import numpy as np

    from chdb_spark.multimodal import decode_ppm, parse_ppm_header, resize_images

    # (a) height=255: dims line ends in b"255\n" — literal search would
    # find it 4 bytes early and shear every pixel row
    w, h = 3, 255
    px = (np.arange(3 * w * h) % 251).astype(np.uint8)
    tall = b"P6\n" + f"{w} {h}\n255\n".encode() + px.tobytes()
    assert parse_ppm_header(tall)[:2] == (w, h)
    # (b) space-separated header — legal P6, decode_ppm accepts it
    flat = b"P6 4 2 255 " + bytes(range(24))
    assert decode_ppm(flat) is not None
    media = spark.createDataFrame(
        [(1, "image", tall), (2, "image", flat)],
        "media_id long, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, max_side=8).collect()}
    # tall image resizes to max_side along height; decoder round-trips
    r1 = out[1]
    assert r1["resized"] and r1["height"] == 8
    dec = decode_ppm(bytes(r1["payload"]))
    assert dec is not None and dec[:2] == (r1["width"], r1["height"])
    # first resized row must equal the first source row sampled at xs —
    # proves the pixel offset was exact (no 4-byte shear)
    hdr = parse_ppm_header(bytes(r1["payload"]))
    got_row0 = bytes(r1["payload"])[hdr[3] : hdr[3] + 3 * r1["width"]]
    xs = (np.arange(r1["width"]) * w) // r1["width"]
    exp_row0 = px.reshape(h, w, 3)[0][xs].tobytes()
    assert got_row0 == exp_row0
    # small flat image passes through byte-identical (no resize needed)
    assert bytes(out[2]["payload"]) == flat and out[2]["resized"] is False


def test_read_table_catalog_cache(spark, tmp_path):
    """read_table resolves a table's metadata ONCE per (path, fingerprint)
    — the session-catalog behavior every engine has — and a rewritten
    file (new mtime/size) misses the cache and re-derives: stale plans
    can never be served."""
    import pandas as pd

    from chdb_spark.session import read_table

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1, 2]}).to_parquet(p)
    d1 = read_table(spark, p)
    d2 = read_table(spark, p)
    assert d1 is d2  # cache hit: the same immutable plan object
    assert d2.count() == 2

    import os
    import time as _time

    _time.sleep(0.01)  # ensure the rewrite lands on a distinct mtime_ns
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(p)
    os.utime(p)
    d3 = read_table(spark, p)
    assert d3 is not d2  # fingerprint change: fresh derivation
    assert d3.count() == 3 and set(d3.columns) == {"a", "b"}


def test_state_partitions_scopes_and_restores(spark):
    """state_partitions sets the shuffle-partition conf only inside the
    block and restores the prior value on clean exit AND on exception —
    a leaked conf would silently resize every later query's shuffles."""
    import pytest

    from chdb_spark.streaming.core import state_partitions

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    with state_partitions(spark, 7):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior
    with pytest.raises(RuntimeError, match="boom"):
        with state_partitions(spark, 5):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior
