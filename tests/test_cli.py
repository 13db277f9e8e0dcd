"""End-to-end CLI: run -> summarise -> compare, driving the same surface
a spark-submit user would."""

import pandas as pd
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark import cli
from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

CONFIG_TMPL = """
projectname = "cli_e2e"
output_directory = "{outdir}"
append_to_spine = true
construct_entityid_from = ["firstname", "lastname", "birthdate"]
block_salt_buckets = 4
[spine]
datafile = ""
columns = ["EntityId", "firstname", "lastname", "birthdate"]
[[tables]]
name = "transcripts"
datafile = "{datafile}"
primarykey = ["conv_id"]
[[criteria]]
tablename = "transcripts"
[criteria.exactmatch]
firstname = "firstname"
lastname = "lastname"
birthdate = "birthdate"
[[criteria]]
tablename = "transcripts"
[criteria.exactmatch]
firstname = "firstname"
birthdate = "birthdate"
[[criteria.approxmatch]]
datacolumn = "lastname"
spinecolumn = "lastname"
distancemetric = "levenshtein"
threshold = 0.3
"""


def _make_run(spark, tmp_path, tag, n=25):
    transcripts, _ = synthesize_transcripts(spark, n_entities=n)
    datafile = str(tmp_path / f"turns_{tag}.parquet")
    transcripts.write.parquet(datafile)
    outdir = str(tmp_path / f"run_{tag}")
    cfg = tmp_path / f"cfg_{tag}.toml"
    cfg.write_text(CONFIG_TMPL.format(outdir=outdir, datafile=datafile))
    assert cli.main(["run", str(cfg)]) == 0
    return outdir


def test_cli_run_summarise_compare(spark, tmp_path):
    run1 = _make_run(spark, tmp_path, "a", n=25)
    run2 = _make_run(spark, tmp_path, "b", n=30)

    out = spark.read.parquet(f"{run1}/output/spine")
    assert out.count() > 0
    links = spark.read.parquet(f"{run1}/output/links")
    assert links.count() > 0
    assert set(links.columns) == {"TableName", "EventId", "EntityId", "CriteriaId"}
    crit = spark.read.parquet(f"{run1}/output/criteria")
    assert crit.count() == 2

    summary = str(tmp_path / "summary.csv")
    assert cli.main(["summarise", run1, summary]) == 0
    sdf = pd.read_csv(summary)
    assert set(sdf.columns) == {"tablename", "status", "n"}
    assert sdf[sdf.tablename == "spine"]["n"].iloc[0] == out.count()
    tbl = sdf[sdf.tablename != "spine"]
    assert tbl["n"].sum() == spark.read.parquet(f"{run1}/output/events_transcripts").count()

    # delimiter inference from the extension (reporting.jl:192-196)
    summary_tsv = str(tmp_path / "summary.tsv")
    assert cli.main(["summarise", run1, summary_tsv]) == 0
    tdf = pd.read_csv(summary_tsv, sep="\t")
    assert list(tdf.columns) == list(sdf.columns)
    assert "\t" in open(summary_tsv).readline()

    cmp_out = str(tmp_path / "cmp.csv")
    assert cli.main(["compare", run1, run2, cmp_out]) == 0
    cdf = pd.read_csv(cmp_out)
    assert set(cdf.columns) == {"tablename", "status1", "status2", "n"}
    assert "spine" in set(cdf["tablename"])
    # run2 has 5 extra entities: some events nonexistent in run 1
    tt = cdf[cdf.tablename == "transcripts"]
    assert (tt.status1 == "nonexistent").any()


def test_cli_resume_flag(spark, tmp_path):
    run1 = _make_run(spark, tmp_path, "r", n=10)
    cfg = tmp_path / "cfg_r.toml"
    # rerun with --resume: all stages complete -> identical outputs, no error
    before = sorted(
        map(tuple, spark.read.parquet(f"{run1}/output/links").collect())
    )
    assert cli.main(["run", str(cfg), "--resume"]) == 0
    after = sorted(map(tuple, spark.read.parquet(f"{run1}/output/links").collect()))
    assert before == after


def test_cli_curate_end_to_end(spark, tmp_path):
    """curate: quality gate -> exact-dedup canonical -> mixed -> shards
    + before/after report + manifest, from one command."""
    import pandas as pd
    from pyspark.sql import functions as F

    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose "
    )
    rows = [(i, "web" if i % 2 == 0 else "code", good + f"tail {i}") for i in range(40)]
    rows += [(100, "web", "too short")]          # quality-dropped
    rows += [(101, "web", rows[0][2])]           # exact dup of doc 0 -> dropped
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(docs_path)

    out = str(tmp_path / "curated")
    assert cli.main(["curate", docs_path, out, "--max-records-per-file", "10"]) == 0

    corpus = spark.read.parquet(f"{out}/corpus")
    ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert 100 not in ids and 101 not in ids and 0 in ids
    assert len(ids) == 40

    report = pd.read_csv(f"{out}/report.csv")
    assert set(report["stage"]) == {"input", "output"}
    assert report[report.stage == "output"]["quality_pass_rate"].min() == 1.0

    manifest = pd.read_csv(f"{out}/manifest.csv")
    assert manifest["n_records"].sum() == 40
    assert manifest["n_records"].max() <= 10


def test_cli_curate_with_mixing(spark, tmp_path):
    from pyspark.sql import functions as F

    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose "
    )
    # the input carries its OWN n_tokens column (sentinel values): the
    # mix must neither clobber nor drop it
    rows = [
        (i, "web" if i % 2 == 0 else "code", good + f"tail {i}", 7_000 + i)
        for i in range(60)
    ]
    # a source absent from --mix-weights: excluded from output, visible in plan
    rows += [(200, "books", good + "books tail", 9_999)]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_tokens long"
    ).write.parquet(docs_path)
    out = str(tmp_path / "mixed")
    assert cli.main([
        "curate", docs_path, out,
        "--mix-budget", "300", "--mix-weights", "web=0.8,code=0.2",
    ]) == 0
    corpus = spark.read.parquet(f"{out}/corpus")
    n = corpus.count()
    assert 0 < n < 60  # the budget genuinely subsampled
    got = {r["doc_id"]: r["n_tokens"] for r in corpus.collect()}
    assert got and all(v == 7_000 + k for k, v in got.items())  # user column intact
    assert "_mix_n_tokens" not in corpus.columns
    assert 200 not in got  # unweighted source excluded from output ...
    import pandas as pd

    plan = pd.read_csv(f"{out}/mix_plan.csv")
    assert "books" in set(plan["source"])  # ... but visible in the mix plan
    assert plan.loc[plan.source == "books", "rate"].isna().all()


def test_cli_curate_missing_column(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(p)
    import pytest

    with pytest.raises(SystemExit, match="missing required column"):
        cli.main(["curate", p, str(tmp_path / "o")])


def test_cli_curate_mix_weight_errors(spark, tmp_path):
    import pytest

    p = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        [(1, "web", "some text")], "doc_id long, source string, text string"
    ).write.parquet(p)
    out = str(tmp_path / "o")
    with pytest.raises(SystemExit, match="requires --mix-weights"):
        cli.main(["curate", p, out, "--mix-budget", "100"])
    with pytest.raises(SystemExit, match="malformed --mix-weights"):
        cli.main(["curate", p, out, "--mix-budget", "100", "--mix-weights", "web"])
    with pytest.raises(SystemExit, match="non-numeric weight"):
        cli.main(["curate", p, out, "--mix-budget", "100", "--mix-weights", "web=x"])


def test_cli_curate_split_and_epoch_shuffle(spark, tmp_path):
    """curate --split-weights --epoch-shuffle: output partitions by
    split, every doc carries its deterministic assignment and shuffle
    key, and each written file is internally in epoch order."""
    import os

    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose "
    )
    rows = [(i, "web", good + f"tail {i}") for i in range(60)]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(docs_path)

    out = str(tmp_path / "curated")
    assert cli.main([
        "curate", docs_path, out,
        "--split-weights", "train=0.8,val=0.1,test=0.1",
        "--epoch-shuffle", "3",
    ]) == 0

    # split directories, not source directories
    dirs = {d for d in os.listdir(f"{out}/corpus") if d.startswith("split=")}
    assert "split=train" in dirs and len(dirs) >= 2
    corpus = spark.read.parquet(f"{out}/corpus")
    assert {"split", "shuffle_key", "source"} <= set(corpus.columns)
    assert corpus.count() == 60
    # assignment matches the operator (pure function of doc_id)
    from spinebasedrecordlinkage_jl_spark.operators import curation as C
    expect = {
        r["doc_id"]: r["split"]
        for r in C.split_corpus(
            spark.read.parquet(docs_path), {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    got = {r["doc_id"]: r["split"] for r in corpus.collect()}
    assert got == expect
    # every written file is internally in epoch order
    import glob
    import pandas as pd
    for f in glob.glob(f"{out}/corpus/*/*.parquet"):
        keys = pd.read_parquet(f)["shuffle_key"].tolist()
        assert keys == sorted(keys), f


def test_cli_curate_split_weight_errors(spark, tmp_path):
    import pytest

    p = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        [(0, "web", "x")], "doc_id long, source string, text string"
    ).write.parquet(p)
    out = str(tmp_path / "o")
    with pytest.raises(SystemExit, match="sum to 1.0"):
        cli.main(["curate", p, out, "--split-weights", "train=0.8,val=0.1"])
    with pytest.raises(SystemExit, match="malformed --split-weights"):
        cli.main(["curate", p, out, "--split-weights", "train"])


def test_cli_curate_decontaminate(spark, tmp_path):
    """--decontaminate drops documents sharing a word n-gram with the
    benchmark table; everything else survives unchanged."""
    import pytest
    good = (
        "this is a perfectly reasonable document with enough plain words "
        "that the quality gate will let it through because it is long and "
        "has the usual stopword density of real prose "
    )
    leak = "the secret benchmark answer is exactly forty two believe me"
    rows = [(i, "web", good + f"tail {i}") for i in range(10)]
    rows += [(50, "web", good + leak + " padded out with more plain text")]
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(docs_path)

    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame([(1, leak)], "doc_id long, text string").write.parquet(bench_path)

    out = str(tmp_path / "curated")
    assert cli.main([
        "curate", docs_path, out,
        "--decontaminate", bench_path, "--decon-n", "5",
    ]) == 0
    ids = {r["doc_id"] for r in spark.read.parquet(f"{out}/corpus").select("doc_id").collect()}
    assert 50 not in ids and len(ids) == 10

    # a benchmark table without text is a config error, not a crash
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1,)], "x long").write.parquet(bad)
    with pytest.raises(SystemExit, match="text"):
        cli.main(["curate", docs_path, str(tmp_path / "o2"), "--decontaminate", bad])
