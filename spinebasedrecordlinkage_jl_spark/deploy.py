"""Packaging + submission helpers for the north-star deployment path:

    spark-submit --master <cluster> --py-files spinelink.zip \\
        scripts/submit_linkage.py run config.toml [--resume]

``build_pyfiles_zip`` produces the ``--py-files`` archive from the
installed package source (pure-Python package, nothing to compile);
``submit_argv`` renders the full spark-submit command line. The
reference is deployed as a Julia project (`/root/reference/Project.toml`
+ scripts/*.jl run with `julia script.jl config`); the Spark-native
equivalent of that "ship the code next to the config" contract is a
py-files zip, which spark-submit distributes to the driver and every
executor's Python workers.

``tests/test_spark_submit.py`` runs the real binary end-to-end on a
synthesized transcript corpus with PYTHONPATH scrubbed and a neutral
cwd, so the zip is provably the only source of the package in both the
driver process and the executor-side Python workers.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

PACKAGE = "spinebasedrecordlinkage_jl_spark"

#: Default location of the spark-submit binary when $SPARK_HOME/bin is
#: not on PATH (the sandbox layout).
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def build_pyfiles_zip(out_path: str | Path) -> str:
    """Zip the package source into a ``--py-files`` archive.

    Only ``*.py`` files are shipped (the package has no data files);
    entries are sorted and carry a fixed timestamp so the same tree
    always produces a byte-identical archive — rsync/object-store
    deduplication and image caching both benefit at real deployment
    cadence.
    """
    pkg_root = Path(__file__).resolve().parent
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg_root.rglob("*.py")):
            if "__pycache__" in f.parts:
                continue
            arcname = f"{PACKAGE}/{f.relative_to(pkg_root)}"
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, f.read_bytes())
    return str(out)


def submit_argv(
    job_script: str | Path,
    *job_args: str,
    master: str | None = None,
    py_files: str | Path | None = None,
    conf: dict[str, str] | None = None,
    driver_memory: str | None = None,
    spark_submit: str = SPARK_SUBMIT,
) -> list[str]:
    """Render the spark-submit command for a linkage job.

    On a real cluster ``master`` is e.g. ``yarn`` / ``k8s://...`` /
    ``spark://...``; in tests ``local[N]``. The job script must set
    ``SPINELINK_MASTER=''`` (``scripts/submit_linkage.py`` does) so the
    in-package session factory inherits the submit-time master instead
    of forcing its local[N] test default.
    """
    argv = [str(spark_submit)]
    if master:
        argv += ["--master", master]
    if py_files:
        argv += ["--py-files", str(py_files)]
    if driver_memory:
        argv += ["--driver-memory", driver_memory]
    for k, v in (conf or {}).items():
        argv += ["--conf", f"{k}={v}"]
    argv += [str(job_script), *[str(a) for a in job_args]]
    return argv
