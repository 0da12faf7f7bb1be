"""Streaming extraction parity + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.operators import multimodal
from mannheimsearchjoinsengine_spark.operators.extract import extract_facts
from mannheimsearchjoinsengine_spark.sources.transcripts import load_table, load_transcripts
from mannheimsearchjoinsengine_spark.streaming.extract_stream import (
    run_streaming_extraction,
    transcript_stream,
    windowed_turn_counts,
)


def test_streaming_extraction_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "facts_out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_extraction(spark, sf_dir, out, ckpt)
    streamed = spark.read.parquet(out)
    batch = extract_facts(load_transcripts(spark, sf_dir))
    cols = ["conv_id", "turn_idx", "src", "pred_raw", "subj_surface", "obj_raw"]
    assert streamed.count() == batch.count()
    assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0
    # idempotency WITHIN one lineage: re-running with the SAME checkpoint
    # (crash-replay shape) must not duplicate rows
    run_streaming_extraction(spark, sf_dir, out, ckpt)
    replayed = spark.read.parquet(out)
    assert replayed.count() == batch.count()
    assert replayed.select(cols).exceptAll(batch.select(cols)).count() == 0
    # a FRESH checkpoint into the existing sink is a different lineage —
    # could batch into fewer epochs and leave stale partitions as dups, so
    # the sink-lineage marker refuses it loudly
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="lineage"):
        run_streaming_extraction(spark, sf_dir, out, str(tmp_path / "ckpt_replay"))


def test_streaming_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    q = (
        windowed_turn_counts(transcript_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts")
    want = (
        load_transcripts(spark, sf_dir)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_multimodal_payload_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    feats = multimodal.payload_features(multimodal.with_payload(docs))
    rows = {r.doc_id: r for r in feats.collect()}
    for d in docs.collect():
        b = d.text.encode("utf-8")
        r = rows[d.doc_id]
        assert r.n_bytes == len(b)
        assert r.first_byte == b[0]
        assert r.last_byte == b[-1]
        assert r.byte_sum == sum(b)
        assert r.fake_width == len(b) % 640
        assert r.fake_height == (len(b) * 7) % 480


def test_multimodal_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    frames = multimodal.frame_sample(multimodal.with_payload(docs), every_n=4)
    got = [(r.doc_id, r.frame_idx, r.frame_len, r.frame_sum) for r in frames.collect()]
    want = []
    FB = multimodal.FRAME_BYTES
    for d in docs.collect():
        b = d.text.encode("utf-8")
        for fi in range(0, (len(b) + FB - 1) // FB, 4):
            chunk = b[fi * FB : (fi + 1) * FB]
            want.append((d.doc_id, fi, len(chunk), sum(chunk)))
    assert sorted(got) == sorted(want)


def test_multimodal_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")


def test_stateful_conv_progress_matches_batch(spark, sf_dir, tmp_path):
    from mannheimsearchjoinsengine_spark.streaming.extract_stream import (
        stateful_conv_progress,
    )

    q = (
        stateful_conv_progress(transcript_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination()
    # last emitted row per conv == final state
    got = (
        spark.sql("SELECT * FROM conv_progress")
        .groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), F.max("max_turn_idx").alias("max_turn_idx"))
    )
    want = (
        load_transcripts(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_stateful_survives_foreign_parquet_in_stream_dir(spark, sf_dir, tmp_path):
    """A foreign-schema parquet in the streamed directory reads as all-null
    transcript rows (file-source streams apply the declared schema to every
    file). The stateful operator must neither crash on the NaN turn_idx max
    nor emit a phantom null-conv_id group — invalid rows are filtered
    JVM-side and the final state must equal the clean batch aggregate."""
    import shutil

    from mannheimsearchjoinsengine_spark.datagen import ensure_transcripts
    from mannheimsearchjoinsengine_spark.streaming.extract_stream import (
        stateful_conv_progress,
        transcript_stream,
    )

    src = ensure_transcripts(sf_dir)
    stream_dir = tmp_path / "stream_src"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "transcripts.parquet")
    # the foreign file: valid parquet, entirely different schema
    spark.createDataFrame([("x", 1.5)], "tok: string, weight: double").coalesce(
        1
    ).write.parquet(str(stream_dir / "foreign"))
    for f in (stream_dir / "foreign").glob("*.parquet"):
        shutil.move(str(f), stream_dir / "foreign.parquet")
    shutil.rmtree(stream_dir / "foreign")

    q = (
        stateful_conv_progress(
            spark.readStream.schema(
                transcript_stream(spark, sf_dir).schema
            ).parquet(str(stream_dir))
        )
        .writeStream.format("memory")
        .queryName("conv_progress_foreign")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_f"))
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM conv_progress_foreign")
        .groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), F.max("max_turn_idx").alias("max_turn_idx"))
    )
    want = (
        load_transcripts(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
    )
    assert got.filter(F.col("conv_id").isNull()).count() == 0
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_read_transcript_table_formats(spark, sf_dir, tmp_path):
    """S1-S5 reader dispatch: csv(.gz)/json transcript tables round-trip to
    the parquet source exactly (explicit schema, no inference), format is
    inferred from the extension, and missing required columns fail loudly."""
    from mannheimsearchjoinsengine_spark.sources.transcripts import (
        read_transcript_table,
    )

    want = load_transcripts(spark, sf_dir)

    csv_dir = str(tmp_path / "t.csv")
    want.coalesce(1).write.options(header=True, compression="gzip").csv(csv_dir)
    got_csv = read_transcript_table(spark, csv_dir)
    assert got_csv.schema == want.schema
    assert got_csv.exceptAll(want).count() == 0
    assert want.exceptAll(got_csv).count() == 0

    # newline/comma/quote-bearing text must survive the csv round trip
    # (multiLine=True; Spark's writer quotes them)
    from pyspark.sql import Row

    tricky = spark.createDataFrame(
        [
            Row(
                conv_id="c_tricky",
                turn_idx=0,
                role="user",
                text='line one\nline "two", with comma',
                tool=None,
                ts=None,
            )
        ],
        want.schema,
    )
    tricky_dir = str(tmp_path / "tricky.csv")
    want.unionByName(tricky).coalesce(1).write.options(header=True).csv(tricky_dir)
    got_tricky = read_transcript_table(spark, tricky_dir)
    assert (
        got_tricky.filter(F.col("conv_id") == "c_tricky").first().text
        == 'line one\nline "two", with comma'
    )
    assert got_tricky.count() == want.count() + 1

    json_dir = str(tmp_path / "t.jsonl")
    want.coalesce(1).write.json(json_dir)
    got_json = read_transcript_table(spark, json_dir)
    assert got_json.exceptAll(want).count() == 0
    assert want.exceptAll(got_json).count() == 0

    with pytest.raises(ValueError, match="cannot infer"):
        read_transcript_table(spark, str(tmp_path / "t.xlsx"))

    # json field-name mismatch: the one-line peek makes it loud
    badj = str(tmp_path / "badfield.jsonl")
    want.withColumnRenamed("conv_id", "conversation_id").coalesce(1).write.json(badj)
    with pytest.raises(ValueError, match="lacks columns"):
        read_transcript_table(spark, badj)

    bad_dir = str(tmp_path / "bad.csv")
    want.select("conv_id", "text").coalesce(1).write.options(header=True).csv(bad_dir)
    with pytest.raises(ValueError, match="lacks columns"):
        read_transcript_table(spark, bad_dir)

    # csv columns bind by NAME: a reordered table still round-trips
    perm_dir = str(tmp_path / "perm.csv")
    want.select("ts", "text", "tool", "role", "turn_idx", "conv_id").coalesce(
        1
    ).write.options(header=True).csv(perm_dir)
    got_perm = read_transcript_table(spark, perm_dir)
    assert got_perm.schema == want.schema
    assert got_perm.exceptAll(want).count() == 0

    # parquet lacking required columns fails with the explicit ValueError
    bad_pq = str(tmp_path / "bad.parquet")
    want.select("conv_id", "text").write.parquet(bad_pq)
    with pytest.raises(ValueError, match="lacks columns"):
        read_transcript_table(spark, bad_pq)


def test_streaming_exact_dedup_matches_batch_fp_set(spark, sf_dir, tmp_path):
    """Streaming first-arrival dedup: the surviving fingerprint SET equals
    batch exact_dedup's groups, exactly one survivor per fingerprint, and
    checkpoint replay does not duplicate."""
    from mannheimsearchjoinsengine_spark.operators.dedup import exact_dedup
    from mannheimsearchjoinsengine_spark.sources.transcripts import load_table
    from mannheimsearchjoinsengine_spark.streaming.dedup_stream import (
        run_streaming_dedup,
    )

    # stage the table into a landing DIRECTORY (file sources stream dirs)
    import shutil

    landing = tmp_path / "docs_landing"
    landing.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", landing / "part-000.parquet")
    docs_path = str(landing)
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")
    run_streaming_dedup(spark, docs_path, out, ckpt)
    streamed = spark.read.parquet(out)
    batch = exact_dedup(load_table(spark, sf_dir, "documents"))
    s_fps = {r.fp for r in streamed.select("fp").collect()}
    b_fps = {r.fp for r in batch.select("fp").collect()}
    assert s_fps == b_fps
    # exactly one survivor per fingerprint
    assert streamed.count() == len(s_fps)
    # survivors are real documents (id + text round-trip)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < streamed.count() <= n_docs
    # replay with the same checkpoint: no duplicates
    run_streaming_dedup(spark, docs_path, out, ckpt)
    assert spark.read.parquet(out).count() == len(s_fps)


def test_streaming_dedup_suppresses_later_arrivals(spark, sf_dir, tmp_path):
    """The online guarantee: a duplicate landing in a LATER file — and in a
    later availableNow run resumed from the same checkpoint — is suppressed
    by the fingerprint state within the watermark horizon."""
    from pyspark.sql import Row
    from mannheimsearchjoinsengine_spark.streaming.dedup_stream import (
        run_streaming_dedup,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    first = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="delta epsilon zeta"),
        ]
    )
    first.coalesce(1).write.mode("append").parquet(str(landing))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_streaming_dedup(spark, str(landing), out, ckpt)
    assert spark.read.parquet(out).count() == 2
    # a later file: one exact re-arrival (different id), one new doc
    second = spark.createDataFrame(
        [
            Row(doc_id=3, text="alpha beta gamma"),
            Row(doc_id=4, text="brand new document"),
        ]
    )
    second.coalesce(1).write.mode("append").parquet(str(landing))
    run_streaming_dedup(spark, str(landing), out, ckpt)
    survivors = spark.read.parquet(out)
    assert survivors.count() == 3  # re-arrival suppressed, new doc kept
    ids = {r.doc_id for r in survivors.collect()}
    assert 4 in ids and 3 not in ids
