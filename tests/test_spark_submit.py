"""Real spark-submit --py-files deployment evidence.

The north rule requires the pipeline to run "via spark-submit --py-files
on a multi-executor cluster". This test exercises that exact path with
the real binary: package zipped by ``deploy.build_pyfiles_zip``, job
script ``scripts/submit_linkage.py``, PYTHONPATH scrubbed and cwd moved
to a neutral directory so the zip is provably the only source of the
package for the driver process AND the executor-side Python workers
(the Arrow-batched distance UDFs import the package inside executors,
so a run that links fuzzy criteria proves executor-side shipping too).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from spinebasedrecordlinkage_jl_spark.deploy import (
    SPARK_SUBMIT,
    build_pyfiles_zip,
    submit_argv,
)
from spinebasedrecordlinkage_jl_spark.sources.transcripts import synthesize_transcripts

REPO = Path(__file__).resolve().parent.parent

CONFIG_TMPL = """
projectname = "submit_e2e"
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
distancemetric = "jarowinkler"
threshold = 0.3
"""


def test_pyfiles_zip_is_deterministic_and_complete(tmp_path):
    import zipfile

    z1 = build_pyfiles_zip(tmp_path / "a.zip")
    z2 = build_pyfiles_zip(tmp_path / "b.zip")
    # byte-identical archives from the same tree (cacheable artifact)
    assert Path(z1).read_bytes() == Path(z2).read_bytes()
    names = set(zipfile.ZipFile(z1).namelist())
    pkg = "spinebasedrecordlinkage_jl_spark"
    for mod in (
        f"{pkg}/__init__.py",
        f"{pkg}/cli.py",
        f"{pkg}/operators/linkage.py",
        f"{pkg}/operators/spine.py",
        f"{pkg}/functions/distances.py",
        f"{pkg}/streaming/linkage.py",
    ):
        assert mod in names, mod
    assert not any("__pycache__" in n for n in names)


@pytest.mark.slow
@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit binary")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # n_entities=60: corruption-3 (lastname typo) hits ~1/16 of non-first
    # conversations, so the fuzzy criterion deterministically links >0
    # records at this size (seeded synthesis — the count is pinned).
    transcripts, _ = synthesize_transcripts(spark, n_entities=60)
    datafile = str(tmp_path / "turns.parquet")
    transcripts.write.parquet(datafile)

    outdir = str(tmp_path / "run")
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(CONFIG_TMPL.format(outdir=outdir, datafile=datafile))

    zip_path = build_pyfiles_zip(tmp_path / "spinelink.zip")
    argv = submit_argv(
        REPO / "scripts" / "submit_linkage.py",
        "run",
        cfg,
        master="local[4]",
        py_files=zip_path,
        driver_memory="2g",
        conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
        },
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # The job must inherit --master and --conf from spark-submit, not
    # the in-package test defaults.
    env["SPINELINK_MASTER"] = ""
    env["SPINELINK_SHUFFLE_PARTITIONS"] = "8"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        argv,
        cwd=str(tmp_path),  # neutral cwd: repo root NOT importable
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    # cmd_run prints the run directory on success
    assert outdir in proc.stdout

    spine = spark.read.parquet(f"{outdir}/output/spine")
    links = spark.read.parquet(f"{outdir}/output/links")
    assert spine.count() > 0
    assert links.count() > 0
    # the fuzzy criterion ran executor-side Arrow UDFs from the zip
    crit_ids = {r["CriteriaId"] for r in links.select("CriteriaId").distinct().collect()}
    assert 2 in crit_ids, f"fuzzy criterion never linked: {crit_ids}"
