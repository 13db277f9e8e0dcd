"""Text-analysis functions, reporting operators, multimodal plumbing,
and streaming records."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.functions import text as T
from spinebasedrecordlinkage_jl_spark.operators import multimodal as M
from spinebasedrecordlinkage_jl_spark.operators import reporting as R


class TestText:
    def _one(self, spark, col_expr, text):
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(col_expr.alias("v")).collect()[0]["v"]

    def test_token_counts(self, spark):
        assert self._one(spark, T.ws_token_count(F.col("text")), "a b  c") == 3
        assert self._one(spark, T.ws_token_count(F.col("text")), "") == 0
        assert self._one(spark, T.alnum_token_count(F.col("text")), "foo, bar! 42") == 3

    def test_punct_ratio(self, spark):
        assert self._one(spark, T.punct_ratio(F.col("text")), "ab..") == pytest.approx(0.5)
        assert self._one(spark, T.punct_ratio(F.col("text")), "") == 0.0

    def test_stopword_count_adjacent(self, spark):
        # adjacent stopwords must each count (space-doubling trick)
        assert self._one(spark, T.stopword_count(F.col("text")), "the the the") == 3
        assert self._one(spark, T.stopword_count(F.col("text")), "a the of and is") == 5
        assert self._one(spark, T.stopword_count(F.col("text")), "theater atheist") == 0

    def test_lang_id(self, spark):
        assert self._one(spark, T.lang_id(F.col("text")), "the cat is on the mat") == "en"
        assert self._one(spark, T.lang_id(F.col("text")), "el gato y la casa que") == "es"
        assert self._one(spark, T.lang_id(F.col("text")), "xyz qwerty") == "und"

    def test_quality_score_bounds(self, spark):
        v = self._one(spark, T.quality_score(F.col("text")), "the cat is on the mat " * 10)
        assert 0.0 <= v <= 1.0

    def test_fingerprint_stability(self, spark):
        fmin, fmax = T.rolling_fingerprint(F.col("text"))
        df = spark.createDataFrame([("same prefix content here",), ("same prefix content here",)], "text string")
        rows = df.select(fmin.alias("a"), fmax.alias("b")).collect()
        assert rows[0] == rows[1]


class TestReporting:
    def test_compare_spines(self, spark):
        s1 = spark.createDataFrame([(1,), (2,), (3,)], "EntityId long")
        s2 = spark.createDataFrame([(2,), (3,), (4,), (4,)], "EntityId long")
        out = {(r["status1"], r["status2"]): r["n"] for r in R.compare_spines(s1, s2).collect()}
        assert out[("existent", "existent")] == 2
        assert out[("existent", "nonexistent")] == 1
        assert out[("nonexistent", "existent")] == 1

    def _links(self, spark, rows):
        return spark.createDataFrame(
            rows, "TableName string, EventId long, EntityId long, CriteriaId int"
        )

    def test_compare_event_tables_statuses(self, spark):
        e1 = spark.createDataFrame([(1,), (2,), (3,)], "EventId long")
        l1 = self._links(spark, [("t", 1, 100, 1)])
        e2 = spark.createDataFrame([(2,), (3,), (4,)], "EventId long")
        l2 = self._links(spark, [("t", 2, 100, 2), ("t", 4, 101, 1)])
        out = {(r["status1"], r["status2"]): r["n"]
               for r in R.compare_event_tables(e1, l1, e2, l2, "t").collect()}
        assert out[("linked with criteria ID 1", "nonexistent")] == 1  # event 1
        assert out[("unlinked", "linked with criteria ID 2")] == 1     # event 2
        assert out[("unlinked", "unlinked")] == 1                      # event 3
        assert out[("nonexistent", "linked with criteria ID 1")] == 1  # event 4

    def test_zero_links_table_no_crash(self, spark):
        """The reference crashes (UndefVarError, reporting.jl:160) when a
        table has events but zero links; we must not."""
        e1 = spark.createDataFrame([(1,), (2,)], "EventId long")
        l1 = self._links(spark, [])
        out = R.summarise_run(e1, l1, "t").collect()
        assert len(out) == 1 and out[0]["status"] == "unlinked" and out[0]["n"] == 2

    def test_table_only_in_run2_counted(self, spark):
        """The reference silently skips tables only in run 2
        (reporting.jl:67); we count them as nonexistent-in-run-1."""
        e1 = spark.createDataFrame([], "EventId long")
        l1 = self._links(spark, [])
        e2 = spark.createDataFrame([(9,)], "EventId long")
        l2 = self._links(spark, [])
        out = {(r["status1"], r["status2"]): r["n"]
               for r in R.compare_event_tables(e1, l1, e2, l2, "t").collect()}
        assert out[("nonexistent", "unlinked")] == 1


class TestMultimodal:
    def test_metadata_matches_hashlib(self, spark):
        docs = spark.createDataFrame([(1, "hello"), (2, "wörld")], "doc_id long, text string")
        out = {r["doc_id"]: r for r in M.extract_metadata(M.with_binary_payload(docs)).collect()}
        assert out[1]["content_hash"] == hashlib.md5(b"hello").hexdigest()
        assert out[1]["n_bytes"] == 5
        assert out[2]["n_bytes"] == len("wörld".encode())

    def test_decode_stub_deterministic_and_plumbed(self, spark):
        docs = spark.createDataFrame([(1, "payload one"), (2, "payload two")], "doc_id long, text string")
        feats = M.decode_features(M.with_binary_payload(docs))
        rows = {r["doc_id"]: r for r in feats.collect()}
        assert set(rows) == {1, 2}
        r = rows[1]
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert len(r["feature"]) == 8
        # deterministic: same payload -> same features
        again = {x["doc_id"]: x for x in M.decode_features(M.with_binary_payload(docs)).collect()}
        assert [round(v, 6) for v in again[1]["feature"]] == [round(v, 6) for v in r["feature"]]

    def test_frame_sample(self, spark):
        df = spark.createDataFrame([(1, 9)], "doc_id long, n_frames int")
        out = M.frame_sample(df, every_n=4).select("frame_idx").collect()
        assert sorted(r["frame_idx"] for r in out) == [0, 4, 8]


class TestStreaming:
    def test_stream_records_availablenow(self, spark, tmp_path):
        from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts
        from spinebasedrecordlinkage_jl_spark.streaming import (
            stream_conversation_records,
            stream_transcripts,
        )

        transcripts, _ = synthesize_transcripts(spark, n_entities=10)
        src = str(tmp_path / "turns")
        transcripts.write.parquet(src)

        turns = stream_transcripts(spark, src)
        rec = stream_conversation_records(turns)
        out_dir = str(tmp_path / "records_out")
        ck = str(tmp_path / "ck")
        q = (
            rec.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.read.parquet(out_dir)
        want = transcripts.select("conv_id").distinct().count()
        # append mode cannot emit sessions still open at end-of-stream
        # (watermark stops at max event time); everything else must emit
        assert got.count() >= 0.8 * want
        # per-turn equality invariant holds through the stream
        some = got.limit(1).collect()[0]["conv_id"]
        row = got.filter(F.col("conv_id") == some).collect()[0]
        assert row["n_turns"] == len(row["turns"])
        batch = transcripts.filter(
            (F.col("conv_id") == some)
        ).orderBy("turn_idx").select("text").collect()
        assert [t["text"] for t in row["turns"]] == [r["text"] for r in batch]
