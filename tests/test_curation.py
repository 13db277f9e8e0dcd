"""Corpus-curation operators: decontamination, PII scrub, deterministic
stratified sampling, quality filter."""

import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "a"),
        (1, "quick brown fox jumps over the lazy dog today", "a"),  # shares 5-grams with 0
        (2, "completely different words in this one entirely", "b"),
        (3, "short", "b"),
        (4, "mail me at alice.smith+x@example.org or call 12 345-6789 ok", "c"),
        (5, "", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_word_ngrams_short_and_empty(docs):
    out = {
        r["doc_id"]: r["g"]
        for r in docs.select("doc_id", C.word_ngrams(F.col("text"), 5).alias("g")).collect()
    }
    assert out[3] == []  # fewer tokens than n
    assert out[5] == []
    assert "the quick brown fox jumps" in out[0]
    # distinct: doc 0 repeats nothing at 5-gram granularity
    assert len(out[0]) == len(set(out[0]))


def test_decontaminate_flags_overlap(docs):
    bench = docs.filter(F.col("doc_id") == 0)
    got = {r["doc_id"]: r for r in C.decontaminate(docs, bench, n=5).collect()}
    assert got[0]["contaminated"]  # benchmark doc overlaps itself
    assert got[1]["contaminated"] and got[1]["n_contaminated_grams"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_contaminated_grams"] == 0
    assert not got[3]["contaminated"]  # too short to form a 5-gram
    assert len(got) == 6  # every input doc present exactly once


def test_pii_scrub_redacts_email_and_number(docs):
    got = {r["doc_id"]: r for r in C.pii_scrub(docs).collect()}
    assert got[4]["text_scrubbed"] == "mail me at <EMAIL> or call <NUMBER> ok"
    assert got[4]["n_redactions"] == 2
    assert got[0]["text_scrubbed"] == got[0]["text_scrubbed"]
    assert got[0]["n_redactions"] == 0
    assert got[5]["n_redactions"] == 0


def test_stratified_sample_deterministic_and_rate_accurate(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    rates = {"a": 0.25, "b": 0.75}
    got1 = set(r["doc_id"] for r in C.stratified_sample(df, rates).collect())
    got2 = set(
        r["doc_id"]
        for r in C.stratified_sample(df.repartition(7), rates).collect()
    )
    assert got1 == got2  # partitioning-independent
    n_a = sum(1 for d in got1 if d % 2 == 0)
    n_b = len(got1) - n_a
    assert abs(n_a / 2000 - 0.25) < 0.05
    assert abs(n_b / 2000 - 0.75) < 0.05
    # a different salt draws a different sample
    got3 = set(r["doc_id"] for r in C.stratified_sample(df, rates, salt="other").collect())
    assert got1 != got3


def test_stratified_sample_default_rate_zero_drops_unknown_strata(docs):
    out = C.stratified_sample(docs, {"a": 1.0})  # b, c default to 0.0
    assert set(r["source"] for r in out.collect()) == {"a"}


def test_quality_filter_reasons(docs):
    got = {r["doc_id"]: r for r in C.quality_filter(
        docs, min_tokens=8, max_punct_ratio=0.1, min_stopword_ratio=0.05
    ).collect()}
    assert got[0]["keep"] and got[0]["reasons"] == ""
    assert not got[3]["keep"] and "short" in got[3]["reasons"]
    # doc 2 has enough tokens but no stopwords... 'in this' contains none of
    # the en markers except none -> stopword reason fires
    assert "stopword" in got[2]["reasons"]
    # empty doc fails short and stopword, reasons joined deterministically
    assert got[5]["reasons"] == "short,stopword"


def test_repetition_stats_lines_and_ngrams(spark):
    rows = [
        # 4 lines, "dup" twice: dup_line_frac=0.25... (2 dup lines of 4)
        (1, "dup\nunique one\ndup\nanother line"),
        (2, "a b a b a b"),  # top 2-gram "a b" x3, len 3 -> 9/11 chars
        (3, ""),  # empty -> all zeros
        (4, "one two three four"),  # nothing repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in C.repetition_stats(df, top_ngram_n=2, dup_ngram_n=2).collect()
    }
    # doc 1: lines = [dup, unique one, dup, another line]; 2 of 4 are dups
    assert got[1]["dup_line_frac"] == pytest.approx(0.5)
    # dup chars = 3+3 = 6 of total 3+10+3+12 = 28
    assert got[1]["dup_line_char_frac"] == pytest.approx(6 / 28, abs=1e-6)
    # doc 2: top 2-gram "a b" occurs 3x, len 3, text len 11
    assert got[2]["top_ngram_char_frac"] == pytest.approx(9 / 11, abs=1e-6)
    # 5 two-gram occurrences: "a b"x3 + "b a"x2 -> all duplicated
    assert got[2]["dup_ngram_frac"] == pytest.approx(1.0)
    assert got[3]["dup_line_frac"] == 0.0
    assert got[3]["top_ngram_char_frac"] == 0.0
    assert got[4]["dup_line_frac"] == 0.0
    assert got[4]["dup_ngram_frac"] == 0.0
    assert len(got) == 4  # every doc present, including gram-less ones


def test_line_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "keep me\nshared line\nonly here"),
        (2, "shared line\nnew in two\nshared line"),  # both copies drop
        (3, "shared line"),  # loses everything
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.line_dedup(df).collect()}
    assert got[1]["text_deduped"] == "keep me\nshared line\nonly here"
    assert got[1]["n_lines_dropped"] == 0
    assert got[2]["text_deduped"] == "new in two"
    assert got[2]["n_lines_kept"] == 1 and got[2]["n_lines_dropped"] == 2
    assert got[3]["text_deduped"] == "" and got[3]["n_lines_kept"] == 0


def test_line_dedup_order_is_global_id_then_pos(spark):
    # the FIRST occurrence by (doc_id, pos) survives, not an arbitrary one
    df = spark.createDataFrame(
        [(5, "x\ny"), (4, "y\nx")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in C.line_dedup(df).collect()}
    assert got[4]["text_deduped"] == "y\nx"
    assert got[5]["text_deduped"] == ""


def test_vocab_topk_deterministic_cut(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple Cherry"),
            (2, "banana apple date2 date2"),
        ],
        "doc_id long, text string",
    )
    got = C.vocab_topk(df, k=3).collect()
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in got] == [
        ("apple", 3, 2),
        ("banana", 2, 2),
        ("date2", 2, 1),  # tie with banana broken by token asc
    ]


def test_quality_filter_terminal_punct(spark):
    df = spark.createDataFrame(
        [(1, "a good long sentence that is of the usual quality and ends well.")],
        "doc_id long, text string",
    )
    ok = C.quality_filter(df, min_tokens=5, require_terminal_punct=True).collect()[0]
    assert ok["keep"]
    df2 = spark.createDataFrame(
        [(1, "a good long sentence that is of the usual quality but unterminated")],
        "doc_id long, text string",
    )
    bad = C.quality_filter(df2, min_tokens=5, require_terminal_punct=True).collect()[0]
    assert not bad["keep"] and bad["reasons"] == "no_terminal_punct"


def test_pack_sequences_contiguous_and_exact(spark):
    """Offsets are the exact exclusive running sum in id order; windows
    tile the token stream with no gap or overlap."""
    rows = [(i, f"d{i}", (i * 37) % 90 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")
    out = sorted(
        C.pack_sequences(df, context_len=64, n_buckets=7).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["doc_id"] for r in out] == list(range(50))
    run = 0
    for r in out:
        assert r["tok_offset"] == run
        assert r["bin_first"] == run // 64
        assert r["bin_last"] == (run + r["n_tokens"] - 1) // 64
        run += r["n_tokens"]


def test_pack_sequences_bucketing_is_invisible(spark):
    """The two-level prefix sum gives the same answer at any bucket
    count (1 = fully sequential reference) and with sparse ids."""
    rows = [(i * 13 + 5, i % 7 + 1) for i in range(40)]  # sparse, non-dense ids
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    ref = sorted(map(tuple, C.pack_sequences(df, 16, n_buckets=1).collect()))
    for nb in (3, 8, 1000):
        got = sorted(map(tuple, C.pack_sequences(df, 16, n_buckets=nb).collect()))
        assert got == ref, nb


def test_pack_sequences_drops_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 7)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in C.pack_sequences(df, 8).collect()}
    assert set(out) == {1, 3}
    assert out[3]["tok_offset"] == 5  # doc 2 occupies no stream position
    assert out[1]["bin_first"] == 0 and out[3]["bin_last"] == 1


def test_pack_sequences_straddles_windows(spark):
    df = spark.createDataFrame([(1, 10), (2, 10)], "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in C.pack_sequences(df, 8).collect()}
    assert (out[1]["bin_first"], out[1]["bin_last"]) == (0, 1)
    assert (out[2]["bin_first"], out[2]["bin_last"]) == (1, 2)


def test_pack_sequences_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 5)], "doc_id string, n_tokens long")
    with pytest.raises(ValueError, match="must be integral"):
        C.pack_sequences(df, 8)
    df2 = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="context_len"):
        C.pack_sequences(df2, 0)


def test_corpus_mix_rates_and_exact_membership(spark):
    """Rates follow min(1, budget*w/avail); the sampled set is exactly
    the rows whose md5-uniform (recomputed independently here) falls
    under the source's rate — deterministic, not statistical."""
    import hashlib

    rows = [(i, "web" if i < 40 else "code", 10) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    # web: avail 400, target 0.75*300=225 -> rate .5625 ; code: avail
    # 200, target 75 -> rate 0.375
    out, plan = C.corpus_mix(
        df, {"web": 0.75, "code": 0.25}, 300, salt="t", return_plan=True
    )
    p = {r["source"]: r for r in plan.collect()}
    assert p["web"]["available_tokens"] == 400 and p["web"]["rate"] == 225 / 400
    assert p["code"]["available_tokens"] == 200 and p["code"]["rate"] == 75 / 200

    def u(doc_id):
        h = hashlib.md5(f"t:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) / 2**32

    expect = {
        i for i, s, _ in rows if u(i) < (225 / 400 if s == "web" else 75 / 200)
    }
    assert {r["doc_id"] for r in out.collect()} == expect
    assert set(out.columns) == {"doc_id", "source", "n_tokens"}


def test_corpus_mix_undersupplied_source_caps_at_one(spark):
    df = spark.createDataFrame(
        [(i, "rare" if i < 3 else "big", 100) for i in range(53)],
        "doc_id long, source string, n_tokens long",
    )
    # rare: avail 300, target 0.5*5000=2500 -> capped; big excluded
    out, plan = C.corpus_mix(df, {"rare": 1.0}, 5000, return_plan=True)
    p = {r["source"]: r for r in plan.collect()}
    assert p["rare"]["rate"] == 1.0
    # excluded source is VISIBLE in the plan (NULL target/rate), not dropped
    assert p["big"]["rate"] is None and p["big"]["target_tokens"] is None
    assert p["big"]["available_tokens"] == 50 * 100
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 2}  # all kept


def test_corpus_mix_partitioning_invariant(spark):
    rows = [(i, f"s{i % 3}", i % 11 + 1) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    w = {"s0": 0.4, "s1": 0.4, "s2": 0.2}
    a = sorted(map(tuple, C.corpus_mix(df, w, 120).collect()))
    b = sorted(map(tuple, C.corpus_mix(df.repartition(7), w, 120).collect()))
    assert a == b and len(a) > 0


def test_corpus_mix_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "a", 5)], "doc_id long, source string, n_tokens long")
    with pytest.raises(ValueError, match="token_budget"):
        C.corpus_mix(df, {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="weights is empty"):
        C.corpus_mix(df, {}, 100)
    with pytest.raises(ValueError, match="positive"):
        C.corpus_mix(df, {"a": 0.0}, 100)


def test_corpus_report_values(spark):
    """Handcrafted two-source corpus: dup mass, pass rate and English
    share come out exactly."""
    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose."
    )
    rows = [
        (1, "web", good),
        (2, "web", good),            # exact dup of 1
        (3, "web", "too short"),     # fails 'short'
        (4, "code", good + " extra"),
        (5, "code", "x = 1"),        # fails gates, not English
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rep = {r["source"]: r for r in C.corpus_report(df).collect()}
    web, code = rep["web"], rep["code"]
    assert (web["n_docs"], web["distinct_contents"]) == (3, 2)
    assert web["dup_fraction"] == round(1 - 2 / 3, 6)
    assert web["quality_pass_rate"] == round(2 / 3, 6)
    assert (code["n_docs"], code["dup_fraction"]) == (2, 0.0)
    assert code["quality_pass_rate"] == 0.5
    # doc 3 ("too short") carries no stopword markers -> 'und', not 'en'
    assert web["n_english"] == 2 and code["n_english"] == 1
    assert web["total_tokens"] > code["total_tokens"]


def test_corpus_report_pass_rate_matches_quality_filter(spark, tmp_path):
    """The report's pass rate is exactly quality_filter's keep fraction
    (shared expression — no drift possible, but pin it)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = C.corpus_report(docs)
    from pyspark.sql import functions as FF

    total_rate = (
        rep.agg(
            (FF.sum(FF.col("quality_pass_rate") * FF.col("n_docs")) / FF.sum("n_docs"))
        ).first()[0]
    )
    kept = C.quality_filter(docs).filter("keep").count()
    assert abs(total_rate - kept / docs.count()) < 1e-6


def test_pack_sequences_63bit_sparse_ids(spark):
    """xxhash64-style id spans (~2^63): the multiply-form bucket index
    would overflow long and scramble offsets; the division form must
    keep the exact global order."""
    ids = [-(2**62), -(2**40), 0, 2**40, 2**62 - 1]
    df = spark.createDataFrame(
        [(i, k + 3) for k, i in enumerate(ids)], "doc_id long, n_tokens long"
    )
    out = sorted(
        C.pack_sequences(df, context_len=4, n_buckets=256).collect(),
        key=lambda r: r["doc_id"],
    )
    run = 0
    for r, (i, t) in zip(out, [(i, k + 3) for k, i in enumerate(ids)]):
        assert (r["doc_id"], r["tok_offset"]) == (i, run)
        run += t


def test_corpus_report_null_text_counts_zero(spark):
    """A NULL-text document contributes 0 tokens (not -1) and fails the
    quality gate on both engine and oracle sides."""
    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose."
    )
    df = spark.createDataFrame(
        [(1, "web", good), (2, "web", None)], "doc_id long, source string, text string"
    )
    row = C.corpus_report(df).collect()[0]
    good_tokens = row["total_tokens"]
    assert good_tokens > 0  # NOT decremented by the NULL doc
    assert row["n_docs"] == 2 and row["quality_pass_rate"] == 0.5


def test_line_dedup_null_text_zero_lines(spark):
    df = spark.createDataFrame(
        [(1, "a line"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in C.line_dedup(df).collect()}
    assert got[2]["text_deduped"] == "" and got[2]["n_lines_kept"] == 0
    assert got[2]["n_lines_dropped"] == 0  # not -1


def test_compact_latest_wins_by_version_then_tiebreak(spark):
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        (1, t, 100, "view", 1.0, "old"),
        (2, t + dt.timedelta(hours=1), 100, "view", 2.0, "new"),   # wins on ts
        (3, t, 100, "click", 3.0, "only"),
        (4, t, 200, "view", 4.0, "a"),
        (5, t, 200, "view", 5.0, "b"),                              # same ts: wins on event_id
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {
        (r["user_id"], r["event_type"]): r
        for r in C.compact_latest(
            df, ["user_id", "event_type"], "ts", tiebreak_cols=["event_id"]
        ).collect()
    }
    assert len(out) == 3
    assert out[(100, "view")]["event_id"] == 2 and out[(100, "view")]["props"] == "new"
    assert out[(100, "click")]["event_id"] == 3
    assert out[(200, "view")]["event_id"] == 5  # ts tie -> higher event_id
    assert list(out[(100, "view")].asDict()) == df.columns  # schema preserved

    with pytest.raises(ValueError, match="missing columns"):
        C.compact_latest(df, ["nope"], "ts")


def test_dup_span_stats_corpus_level(spark):
    # "alpha beta gamma" appears in docs 10 and 11 (cross-doc dup) and
    # TWICE in doc 12 (within-doc dup, counted with multiplicity);
    # doc 13 is unique text; doc 14 NULL; doc 15 too short for a 3-gram.
    rows = [
        (10, "alpha beta gamma one two"),
        (11, "zero alpha beta gamma"),
        (12, "alpha beta gamma alpha beta gamma"),
        (13, "totally unique words here now"),
        (14, None),
        (15, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.dup_span_stats(docs, n=3).collect()}
    assert len(got) == 6  # one row per input doc, NULL text included
    # doc 10: 3 span positions, 1 duplicated ("alpha beta gamma")
    assert got[10]["n_spans"] == 3 and got[10]["n_dup_spans"] == 1
    assert got[10]["has_dup_span"] and abs(got[10]["dup_span_frac"] - 1 / 3) < 1e-12
    assert got[11]["n_dup_spans"] == 1
    # doc 12: 4 positions; "alpha beta gamma" occurs at positions 1 and 4
    # (both count), and "beta gamma alpha" / "gamma alpha beta" are
    # corpus-unique — 2 duplicated of 4
    assert got[12]["n_spans"] == 4 and got[12]["n_dup_spans"] == 2
    assert got[13]["n_dup_spans"] == 0 and not got[13]["has_dup_span"]
    assert got[14]["n_spans"] == 0 and got[14]["dup_span_frac"] == 0.0
    assert got[15]["n_spans"] == 0 and not got[15]["has_dup_span"]


def test_dup_span_stats_within_doc_only_repeat_counts(spark):
    # a span repeated ONLY inside one doc still reaches min_count=2
    docs = spark.createDataFrame(
        [(0, "x y z q x y z"), (1, "a b c d e")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in C.dup_span_stats(docs, n=3).collect()}
    assert got[0]["n_dup_spans"] == 2  # "x y z" at positions 1 and 5
    assert got[1]["n_dup_spans"] == 0


def test_dup_spans_topk_order_and_counts(spark):
    rows = [
        (0, "p q r p q r p q r"),   # "p q r" x3 within one doc
        (1, "p q r s t"),            # +1 occurrence, 2nd doc
        (2, "m n o m n o"),          # "m n o" x2 in one doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.dup_spans_topk(docs, n=3, k=10).collect()
    assert out[0]["span"] == "p q r" and out[0]["n_occ"] == 4 and out[0]["n_docs"] == 2
    by_span = {r["span"]: r for r in out}
    assert by_span["m n o"]["n_occ"] == 2 and by_span["m n o"]["n_docs"] == 1
    # every emitted span genuinely duplicated
    assert all(r["n_occ"] >= 2 for r in out)


def test_split_corpus_fractions_deterministic_and_exhaustive(spark):
    df = spark.range(6000).select(F.col("id").alias("doc_id"))
    out = C.split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 6000  # total partition of the corpus
    assert abs(counts["train"] / 6000 - 0.8) < 0.03
    assert abs(counts["val"] / 6000 - 0.1) < 0.02
    # deterministic: identical assignment on re-run and at another partitioning
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in C.split_corpus(df.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert a == b


def test_split_corpus_validation(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        C.split_corpus(df, {"train": 1.0})  # fewer than two splits
    with pytest.raises(ValueError):
        C.split_corpus(df, {"train": 0.8, "val": 0.1})  # doesn't sum to 1
    with pytest.raises(ValueError):
        C.split_corpus(df, {"train": 1.1, "val": -0.1})  # non-positive weight


def test_epoch_shuffle_order_is_partition_invariant_and_per_epoch(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))

    def order(frame):
        # global order = (range-partition order, within-partition sort):
        # concatenating partitions in id order replays it
        rows = frame.withColumn("_p", F.spark_partition_id()).collect()
        return [r["doc_id"] for r in sorted(rows, key=lambda r: (r["_p"], r["shuffle_key"]))]

    o4 = order(C.epoch_shuffle(df, epoch=1, num_partitions=4))
    o16 = order(C.epoch_shuffle(df.repartition(13), epoch=1, num_partitions=16))
    assert o4 == o16  # same order at any parallelism / input partitioning
    assert sorted(o4) == list(range(500))  # a permutation, nothing lost
    assert o4 != list(range(500))  # actually shuffled
    assert o4 != order(C.epoch_shuffle(df, epoch=2, num_partitions=4))  # fresh per epoch


def test_split_leakage_flags_cross_split_overlap(spark):
    # every doc shares the same text -> any eval doc with enough tokens
    # must leak against the train split (both splits non-empty at n=200)
    same = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    out = C.split_leakage(same, {"train": 0.8, "val": 0.1, "test": 0.1}, n=5).collect()
    assert out and all(r["leaked"] and r["n_leaked_grams"] >= 1 for r in out)
    assert {r["split"] for r in out} <= {"val", "test"}

    # the non-broadcast path (TB-scale eval splits) is value-identical
    shuffled = C.split_leakage(
        same, {"train": 0.8, "val": 0.1, "test": 0.1}, n=5, broadcast_eval=False
    ).collect()
    assert sorted(map(tuple, shuffled)) == sorted(map(tuple, out))

    # per-doc-unique text -> nothing leaks, counts are exact zeros
    uniq = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{i}x"), F.col("id").cast("string")) for i in range(8)],
        ).alias("text"),
    )
    out2 = C.split_leakage(uniq, {"train": 0.8, "val": 0.1, "test": 0.1}, n=5).collect()
    assert out2 and all((not r["leaked"]) and r["n_leaked_grams"] == 0 for r in out2)

    # short docs (< n tokens) yield no grams and therefore never leak
    short = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("only three words").alias("text")
    )
    out3 = C.split_leakage(short, {"train": 0.8, "val": 0.1, "test": 0.1}, n=5).collect()
    assert all((not r["leaked"]) and r["n_leaked_grams"] == 0 for r in out3)


def test_split_leakage_broadcasts_eval_side(spark):
    """Plan contract: the train-corpus gram stream must join the
    eval-derived gram sets via broadcast (the corpus itself is never
    shuffled for the leak check)."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    plan = C.split_leakage(docs, n=5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_strip_dup_spans_removes_covered_tokens(spark):
    rows = [
        (1, "alpha beta gamma delta unique one"),
        (2, "other words alpha beta gamma delta more stuff"),
        (3, "totally unrelated text here now"),
        (4, None),
        (5, "alpha beta gamma delta"),   # fully boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.strip_dup_spans(df, n=4, min_count=2).collect()}
    assert len(out) == 5                           # one row per input doc
    assert out[1]["text_stripped"] == "unique one"
    assert (out[1]["n_tokens"], out[1]["n_tokens_removed"]) == (6, 4)
    assert out[2]["text_stripped"] == "other words more stuff"
    assert out[3]["text_stripped"] == "totally unrelated text here now"
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_stripped"] is None         # NULL text stays NULL
    assert (out[4]["n_tokens"], out[4]["n_tokens_removed"]) == (0, 0)
    assert out[5]["text_stripped"] == ""           # fully covered -> empty
    assert out[5]["n_tokens_removed"] == 4


def test_strip_dup_spans_overlapping_spans_cover_union(spark):
    # "a b c d e" vs "a b c d x" + "x b c d e": doc 20's dup spans
    # [a b c d] and [b c d e] overlap; covered tokens are the UNION
    # (all 5), not double-counted.
    rows = [
        (20, "a b c d e tail"),
        (21, "a b c d x"),
        (22, "x b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.strip_dup_spans(df, n=4, min_count=2).collect()}
    assert out[20]["text_stripped"] == "tail"
    assert out[20]["n_tokens_removed"] == 5


def test_strip_dup_spans_within_doc_repeat(spark):
    # a span repeated within ONE doc reaches min_count by itself
    rows = [(30, "x y z pad x y z"), (31, "unrelated words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.strip_dup_spans(df, n=3, min_count=2).collect()}
    assert out[30]["text_stripped"] == "pad"
    assert out[31]["n_tokens_removed"] == 0
