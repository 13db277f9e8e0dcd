"""Property-based pins (hypothesis): Spark operators vs pure-Python
reference implementations on randomized small frames. Few examples per
property (a Spark round-trip per example), but each example is a full
adversarial input the handcrafted tests would never enumerate."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.operators import curation as C
from spinebasedrecordlinkage_jl_spark.operators.records import transcript_checks

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5_uniform(salt: str, key) -> float:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    context_len=st.integers(min_value=1, max_value=64),
    n_buckets=st.integers(min_value=1, max_value=50),
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_python_reference(spark, toks, context_len, n_buckets):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["tok_offset"], r["bin_first"], r["bin_last"])
        for r in C.pack_sequences(df, context_len, n_buckets=n_buckets).collect()
    }
    run = 0
    expect = {}
    for i, t in enumerate(toks):
        if t > 0:
            expect[i] = (run, run // context_len, (run + t - 1) // context_len)
            run += t
    assert got == expect


@given(
    n=st.integers(min_value=1, max_value=30),
    w_a=st.floats(min_value=0.05, max_value=1.0),
    w_b=st.floats(min_value=0.05, max_value=1.0),
    budget=st.integers(min_value=1, max_value=2000),
)
@settings(**_SETTINGS)
def test_corpus_mix_matches_python_reference(spark, n, w_a, w_b, budget):
    rows = [(i, "a" if i % 2 == 0 else "b", i % 9 + 1) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    weights = {"a": w_a, "b": w_b}
    got = {r["doc_id"] for r in C.corpus_mix(df, weights, budget, salt="p").collect()}

    wsum = w_a + w_b
    avail = {s: sum(t for _, src, t in rows if src == s) for s in ("a", "b")}
    expect = set()
    for i, s, _t in rows:
        if avail[s] == 0:
            continue
        rate = min(1.0, budget * (weights[s] / wsum) / avail[s])
        if _md5_uniform("p", i) < rate:
            expect.add(i)
    assert got == expect


_ROLES = st.sampled_from(["user", "assistant", "tool", "robot", None])


@given(
    convs=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),  # turn_idx (dups/gaps)
                _ROLES,
                st.sampled_from(["hello", "", "  ", "words here", None]),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_transcript_checks_counts_match_python_reference(spark, convs):
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    rows = [
        (f"c{ci}", idx, role, text, None, ts)
        for ci, turns in enumerate(convs)
        for (idx, role, text) in turns
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r["conv_id"]: r for r in transcript_checks(df).collect()}

    valid = {"user", "assistant", "tool"}
    for ci, turns in enumerate(convs):
        r = got[f"c{ci}"]
        assert r["n_turns"] == len(turns)
        assert r["n_bad_role"] == sum(1 for _, ro, _t in turns if ro not in valid)
        assert r["n_empty_text"] == sum(
            1 for *_x, t in turns if t is None or t.strip() == ""
        )
        idxs = [i for i, *_x in turns]
        assert r["n_dup_turn_idx"] == len(idxs) - len(set(idxs))
        assert r["contiguous"] == int(
            min(idxs) == 0 and max(idxs) == len(set(idxs)) - 1
        )
        # first turn under the deterministic struct order (idx, role,
        # text, tool, ts) with None sorting FIRST (Spark sort_array
        # places NULL struct fields first in ascending order)
        key = lambda t: (t[0], t[1] is not None, t[1] or "", t[2] is not None, t[2] or "")
        first_role = sorted(turns, key=key)[0][1]
        assert r["starts_ok"] == int(first_role == "user")


@given(
    n=st.integers(min_value=1, max_value=300),
    w1=st.floats(min_value=0.05, max_value=0.9),
    w2=st.floats(min_value=0.05, max_value=0.9),
    salt=st.sampled_from(["split", "s2", "fold"]),
)
@settings(**_SETTINGS)
def test_split_corpus_matches_python_reference(spark, n, w1, w2, salt):
    """Every row's split equals the pure-Python md5-threshold walk, and
    the splits partition the corpus exactly."""
    total = w1 + w2
    weights = {"a": w1 / total * 0.7, "b": w2 / total * 0.3}
    weights["c"] = 1.0 - sum(weights.values())
    if weights["c"] <= 0:
        return
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in C.split_corpus(df, weights, salt=salt).collect()
    }
    names = list(weights)
    for i in range(n):
        u = _md5_uniform(salt, i)
        expect = names[-1]
        cum = 0.0
        for name in names[:-1]:
            cum += weights[name]
            if u < cum:
                expect = name
                break
        assert got[i] == expect, (i, u)
    assert len(got) == n


@given(
    n=st.integers(min_value=2, max_value=200),
    epoch=st.integers(min_value=0, max_value=5),
    parts=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_epoch_shuffle_matches_python_reference_order(spark, n, epoch, parts):
    """The global (partition, key) order equals sorting doc_ids by the
    pure-Python md5 stream — at any partition count — and is a
    permutation of the input."""
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rows = (
        C.epoch_shuffle(df, epoch=epoch, num_partitions=parts)
        .withColumn("_p", F.spark_partition_id())
        .collect()
    )
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["_p"], r["shuffle_key"]))]
    expect = sorted(
        range(n), key=lambda i: hashlib.md5(f"shuffle:{epoch}:{i}".encode()).hexdigest()
    )
    assert got == expect


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
    min_count=st.integers(min_value=2, max_value=3),
)
@settings(**_SETTINGS)
def test_strip_dup_spans_matches_python_reference(spark, docs, n, min_count):
    """A tiny alphabet forces span collisions; the Spark transform must
    match a direct Python implementation: global span counts -> covered
    position union -> ordered-survivor rebuild."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_stripped"], r["n_tokens"], r["n_tokens_removed"])
        for r in C.strip_dup_spans(df, n=n, min_count=min_count).collect()
    }

    # Python reference. NOTE the tokenizer edge the engine inherits from
    # split(): an empty/whitespace text yields ONE empty token.
    toksed = {
        i: (" ".join(t).strip().split(" ") if " ".join(t).strip() else [""])
        for i, t in enumerate(docs)
    }
    counts: dict = {}
    for i, t in toksed.items():
        for s in range(len(t) - n + 1):
            g = " ".join(t[s : s + n])
            counts[g] = counts.get(g, 0) + 1
    for i, t in toksed.items():
        covered = set()
        for s in range(len(t) - n + 1):
            if counts[" ".join(t[s : s + n])] >= min_count:
                covered.update(range(s, s + n))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        expect = (" ".join(kept), len(t), len(t) - len(kept))
        assert got[i] == expect, (i, t, got[i], expect)
