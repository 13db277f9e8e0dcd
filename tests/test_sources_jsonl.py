"""JSONL transcript ingest: newline-delimited JSON is the most common
interchange format for conversation logs; `read_transcripts` must load it
under the explicit TRANSCRIPT_SCHEMA (no inference pre-scan) and feed the
same downstream pipeline as the parquet path, bit-for-bit."""

import pytest

from spinebasedrecordlinkage_jl_spark.operators.records import conversation_records
from spinebasedrecordlinkage_jl_spark.sources import (
    TRANSCRIPT_SCHEMA,
    read_table,
    read_transcripts,
    synthesize_transcripts,
)


@pytest.fixture(scope="module")
def jsonl_corpus(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("jsonl")
    turns, truth = synthesize_transcripts(spark, n_entities=30, seed=7)
    pq = str(base / "turns.parquet")
    jl = str(base / "turns.jsonl")
    turns.write.parquet(pq)
    # ISO-8601 timestamps, Spark's JSON default — what a log shipper emits
    spark.read.parquet(pq).write.json(jl)
    return pq, jl


def test_jsonl_matches_parquet_schema_and_rows(spark, jsonl_corpus):
    pq, jl = jsonl_corpus
    via_pq = spark.read.parquet(pq).select(*[f.name for f in TRANSCRIPT_SCHEMA.fields])
    via_jl = read_transcripts(spark, jl)
    assert via_jl.schema == via_pq.schema  # incl. ts as a real timestamp
    key = ["conv_id", "turn_idx"]
    a = sorted(map(tuple, via_pq.collect()), key=lambda r: (r[0], r[1]))
    b = sorted(map(tuple, via_jl.collect()), key=lambda r: (r[0], r[1]))
    assert a == b


def test_jsonl_feeds_records_identically(spark, jsonl_corpus):
    """conversation_records over JSONL input == over parquet input."""
    pq, jl = jsonl_corpus
    rec_pq = conversation_records(spark.read.parquet(pq)).drop("EventId")
    rec_jl = conversation_records(read_transcripts(spark, jl)).drop("EventId")
    assert rec_pq.schema == rec_jl.schema
    assert sorted(map(tuple, rec_pq.collect())) == sorted(map(tuple, rec_jl.collect()))


def test_jsonl_schema_is_declared_not_inferred(spark, jsonl_corpus):
    """With TRANSCRIPT_SCHEMA applied, turn_idx stays int (inference would
    widen to bigint) — the observable proof the explicit schema is in
    force and no inference pre-scan of the corpus happens at 100 TB."""
    _, jl = jsonl_corpus
    inferred = read_table(spark, jl)  # no schema: documented test-only path
    assert dict(inferred.dtypes)["turn_idx"] == "bigint"
    declared = read_transcripts(spark, jl)
    assert dict(declared.dtypes)["turn_idx"] == "int"
    assert dict(declared.dtypes)["ts"] == "timestamp"


def test_read_table_csv_honors_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n")
        f.write("c1,0,user,hello,,2026-01-01T00:00:00Z\n")
    df = read_table(spark, p, schema=TRANSCRIPT_SCHEMA)
    assert dict(df.dtypes)["turn_idx"] == "int"
    row = df.collect()[0]
    assert (row.conv_id, row.turn_idx, row.role) == ("c1", 0, "user")


def test_malformed_policy_fail_drop_null(spark, tmp_path):
    """A torn JSONL line: 'fail' aborts the scan loudly, 'drop' discards
    it, 'null' (Spark's silent default, opt-in here) keeps an all-NULL
    row. The policy is chosen at the ingest boundary, never inherited."""
    p = str(tmp_path / "dirty.jsonl")
    with open(p, "w") as f:
        f.write('{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,"ts":"2026-01-01T00:00:00Z"}\n')
        f.write('{"conv_id":"c2","turn_idx":0,"role":"user","text":"yo","tool":null,"ts":"2026-01-01T00:00:01Z"}\n')
        f.write('{"conv_id": TORN LINE NOT JSON\n')

    with pytest.raises(Exception, match="Malformed|FAILFAST|MALFORMED"):
        read_transcripts(spark, p).collect()  # default malformed="fail"

    dropped = read_transcripts(spark, p, malformed="drop")
    assert {r["conv_id"] for r in dropped.collect()} == {"c1", "c2"}

    nulled = read_transcripts(spark, p, malformed="null")
    rows = nulled.collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r["conv_id"] is None) == 1


def test_malformed_rejects_unknown_policy(spark, tmp_path):
    p = str(tmp_path / "x.jsonl")
    open(p, "w").write("{}\n")
    with pytest.raises(ValueError, match="malformed must be one of"):
        read_table(spark, p, malformed="explode")
