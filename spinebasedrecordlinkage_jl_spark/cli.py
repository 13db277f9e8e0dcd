"""Command-line entry points, mirroring the reference's exported surface
(/root/reference/src/SpineBasedRecordLinkage.jl:3 and scripts/*.jl):

    python -m spinebasedrecordlinkage_jl_spark.cli run <config.toml> [--resume]
    python -m spinebasedrecordlinkage_jl_spark.cli summarise <run_dir> <outfile.csv>
    python -m spinebasedrecordlinkage_jl_spark.cli compare <run_dir1> <run_dir2> <outfile.csv>

plus one engine extension beyond the reference's surface:

    python -m spinebasedrecordlinkage_jl_spark.cli curate <docs> <outdir>
        [--mix-budget N --mix-weights 'web=0.6,code=0.4']

Deployment: ship the package via ``spark-submit --py-files spinelink.zip
cli.py run config.toml`` — the driver loop is the only Python that runs
on the driver; all data movement is Spark jobs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from pyspark.sql import SparkSession

from .config import load_config
from .operators.records import conversation_records
from .operators.reporting import compare_event_tables, compare_spines, summarise_run
from .plans.run_linkage import run_linkage
from .session import get_spark
from .sources.readers import read_table


def _load_records(spark: SparkSession, config):
    records = {}
    for name, t in config.tables.items():
        df = read_table(spark, t.datafile)
        if t.schema:
            # Schemata.jl-style fail-fast validation of the input file
            # (one aggregation job; see operators/schema_check.py)
            from .operators.schema_check import enforce_schema

            df = enforce_schema(df, t)
        if {"conv_id", "turn_idx", "text"}.issubset(set(df.columns)):
            df = conversation_records(df, tablename=name)
        elif "EventId" not in df.columns:
            # generic event table (e.g. a reference-style CSV): surrogate
            # EventId = hash(tablename, pk values) — O5,
            # /root/reference/src/runlinkage.jl:131-142
            from pyspark.sql import functions as F

            from .operators.records import event_id

            df = df.withColumn(
                "EventId", event_id(name, *[F.col(c) for c in t.primarykey])
            )
        records[name] = df
    return records


def cmd_run(args) -> int:
    config = load_config(args.config)
    spark = get_spark(f"spinelink:{config.projectname}")
    run = run_linkage(spark, config, _load_records(spark, config), resume=args.resume)
    print(run.output_directory)
    return 0


def _load_run(spark: SparkSession, rundir: str):
    out = Path(rundir) / "output"
    spine = spark.read.parquet(str(out / "spine"))
    links = spark.read.parquet(str(out / "links"))
    events = {
        p.name[len("events_") :]: spark.read.parquet(str(p))
        for p in out.iterdir()
        if p.name.startswith("events_")
    }
    return spine, links, events


def _write_report(frames, outfile: str) -> None:
    # single report file like the reference's sink, delimiter inferred
    # from the extension (reporting.jl:192-196, :265-281): .tsv -> tab
    import pandas as pd

    pdf = pd.concat(frames) if isinstance(frames, list) else frames.toPandas()
    sep = "\t" if outfile.endswith(".tsv") else ","
    pdf.to_csv(outfile, sep=sep, index=False)


def cmd_summarise(args) -> int:
    spark = get_spark("spinelink:summarise")
    spine, links, events = _load_run(spark, args.rundir)
    import pandas as pd

    # leading spine row like the reference's summary (reporting.jl:30-41);
    # the reference's extra "LINKAGE RUNS" path-carrying header row is a
    # deliberate omission (paths are in the manifest instead)
    parts = [pd.DataFrame([{"tablename": "spine", "status": "existent", "n": spine.count()}])]
    parts += [
        summarise_run(ev, links, tablename=t).toPandas() for t, ev in sorted(events.items())
    ]
    _write_report(parts, args.outfile)
    print(args.outfile)
    return 0


def cmd_compare(args) -> int:
    spark = get_spark("spinelink:compare")
    spine1, links1, events1 = _load_run(spark, args.rundir1)
    spine2, links2, events2 = _load_run(spark, args.rundir2)

    parts = [
        compare_spines(spine1, spine2)
        .toPandas()
        .assign(tablename="spine")[["tablename", "status1", "status2", "n"]]
    ]
    # true full-outer across table sets: tables present in either run are
    # reported (the reference skips run-2-only tables, reporting.jl:67)
    for t in sorted(set(events1) | set(events2)):
        e1 = events1.get(t)
        e2 = events2.get(t)
        if e1 is None:
            e1 = e2.limit(0)
        if e2 is None:
            e2 = e1.limit(0)
        parts.append(compare_event_tables(e1, links1, e2, links2, t).toPandas())
    _write_report(parts, args.outfile)
    print(args.outfile)
    return 0


def _parse_weights(spec: str, flag: str) -> dict[str, float]:
    """Parse a 'name=value,name=value' weight spec; SystemExit with the
    offending entry and flag name on malformed input."""
    weights: dict[str, float] = {}
    for kv in spec.split(","):
        kv = kv.strip()
        if not kv:
            continue
        name, sep, value = kv.partition("=")
        if not sep or not name.strip():
            raise SystemExit(
                f"curate: malformed {flag} entry {kv!r} "
                "(expected 'name=value,name=value,...')"
            )
        try:
            weights[name.strip()] = float(value)
        except ValueError:
            raise SystemExit(f"curate: non-numeric weight in {flag} entry {kv!r}")
    return weights


def cmd_curate(args) -> int:
    """One-command corpus curation: quality gate -> (optional) benchmark
    decontamination -> exact-dedup canonicals -> (optional) token-budget
    source mixing -> sharded parquet output, with before/after
    per-source datasheets written as one report CSV. The whole keep-decision is lazy Spark plans over
    the input scan; the only materializations are the two reports and
    the final sharded write."""
    from pyspark.sql import functions as F

    from .operators import curation as C
    from .operators import dedup as D
    from .functions.text import ws_token_count
    from .sinks import shard_manifest, write_corpus_shards

    spark = get_spark("spinelink:curate")
    docs = read_table(spark, args.docs)
    for col in ("doc_id", "source", "text"):
        if col not in docs.columns:
            raise SystemExit(f"curate: input is missing required column {col!r}")

    before = C.corpus_report(docs).toPandas().assign(stage="input")

    kept = docs.join(C.quality_filter(docs).filter("keep"), "doc_id", "left_semi")
    if args.decontaminate:
        bench = read_table(spark, args.decontaminate)
        if "text" not in bench.columns:
            raise SystemExit(
                "curate: --decontaminate table is missing required column 'text'"
            )
        clean = C.decontaminate(kept, bench, n=args.decon_n).filter(
            "NOT contaminated"
        )
        kept = kept.join(clean.select("doc_id"), "doc_id", "left_semi")
    canon = kept.join(
        D.exact_dedup(kept).select(F.col("keep_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    if args.mix_budget:
        weights = _parse_weights(args.mix_weights, "--mix-weights")
        if not weights:
            raise SystemExit(
                "curate: --mix-budget requires --mix-weights "
                "(e.g. --mix-weights 'web=0.6,code=0.4')"
            )
        # compute the mix token count under a reserved temp name so a
        # pre-existing user n_tokens column survives the round trip
        if "_mix_n_tokens" in canon.columns:
            raise SystemExit(
                "curate: input already has a _mix_n_tokens column "
                "(reserved by --mix-budget)"
            )
        in_cols = canon.columns
        toks = canon.withColumn("_mix_n_tokens", ws_token_count(F.col("text")))
        mixed, mix_plan = C.corpus_mix(
            toks, weights, args.mix_budget,
            tokens_col="_mix_n_tokens", return_plan=True,
        )
        canon = mixed.select(*in_cols)
        # the per-source plan makes excluded sources (absent from
        # --mix-weights, NULL rate) and undersupplied targets visible
        Path(args.outdir).mkdir(parents=True, exist_ok=True)
        mix_plan.toPandas().to_csv(
            str(Path(args.outdir) / "mix_plan.csv"), index=False
        )

    partition_col = "source"
    if args.split_weights:
        sw = _parse_weights(args.split_weights, "--split-weights")
        if not sw:
            raise SystemExit("curate: --split-weights given but empty")
        try:
            canon = C.split_corpus(canon, sw)
        except ValueError as e:
            raise SystemExit(f"curate: {e}")
        # trainers consume split directories; source stays a column
        partition_col = "split"
    sort_cols = None
    if args.epoch_shuffle is not None:
        canon = C.epoch_shuffle(canon, epoch=args.epoch_shuffle)
        # the shard writer re-buckets for skew; re-sorting inside each
        # writer task keeps every written file in the epoch order
        sort_cols = ["shuffle_key"]

    # take(1), not count(): the guard only needs existence, and count()
    # would materialize the whole gate+dedup+mix pipeline an extra time
    if not canon.take(1):
        raise SystemExit(
            "curate: 0 documents survived the pipeline (quality gate / dedup / "
            "mix) — nothing written; inspect the input with corpus_report"
        )
    write_corpus_shards(
        canon,
        str(Path(args.outdir) / "corpus"),
        max_records_per_file=args.max_records_per_file,
        partition_by=partition_col,
        sort_within=sort_cols,
    )
    out_docs = read_table(spark, str(Path(args.outdir) / "corpus"))
    after = C.corpus_report(out_docs).toPandas().assign(stage="output")
    _write_report([before, after], str(Path(args.outdir) / "report.csv"))
    shard_manifest(spark, str(Path(args.outdir) / "corpus")).toPandas().to_csv(
        str(Path(args.outdir) / "manifest.csv"), index=False
    )
    print(args.outdir)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="spinelink")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run a linkage config")
    r.add_argument("config")
    r.add_argument("--resume", action="store_true")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("summarise", help="summarise one linkage run")
    s.add_argument("rundir")
    s.add_argument("outfile")
    s.set_defaults(fn=cmd_summarise)

    c = sub.add_parser("compare", help="compare two linkage runs")
    c.add_argument("rundir1")
    c.add_argument("rundir2")
    c.add_argument("outfile")
    c.set_defaults(fn=cmd_compare)

    cu = sub.add_parser("curate", help="curate a documents corpus into training shards")
    cu.add_argument("docs", help="input documents table (parquet/csv/jsonl)")
    cu.add_argument("outdir", help="output directory (corpus/, report.csv, manifest.csv)")
    cu.add_argument("--mix-budget", type=int, default=0, help="token budget for source mixing (0 = no mixing)")
    cu.add_argument("--mix-weights", default="", help="source weights, e.g. 'web=0.6,code=0.4'")
    cu.add_argument("--decontaminate", default="", metavar="BENCH", help="benchmark/eval documents table (parquet/csv/jsonl with a text column); documents sharing any word n-gram with it are dropped")
    cu.add_argument("--decon-n", type=int, default=13, help="word n-gram size for --decontaminate (default 13)")
    cu.add_argument("--split-weights", default="", help="deterministic train/val/test assignment, e.g. 'train=0.98,val=0.01,test=0.01' (output partitions by split)")
    cu.add_argument("--epoch-shuffle", type=int, default=None, metavar="EPOCH", help="write shards in the deterministic epoch-EPOCH shuffle order")
    cu.add_argument("--max-records-per-file", type=int, default=100_000)
    cu.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
