"""spark-submit job entry point for the linkage pipeline.

Usage (cluster):

    spark-submit --master yarn --deploy-mode client \\
        --py-files spinelink.zip \\
        scripts/submit_linkage.py run config.toml [--resume]

    spark-submit ... scripts/submit_linkage.py summarise <run_dir> out.csv
    spark-submit ... scripts/submit_linkage.py compare <run1> <run2> out.csv

The script is deliberately import-thin: everything resolves from the
``--py-files`` archive (``spinebasedrecordlinkage_jl_spark``), which
spark-submit places on the driver's sys.path and ships to every
executor's Python workers. Build the archive with
``spinebasedrecordlinkage_jl_spark.deploy.build_pyfiles_zip``.

The only deployment-specific twist: the in-package session factory
defaults its master to ``local[$SPARK_GRAFT_CPUS]`` for tests; under
spark-submit the master comes from the command line, so we blank
``SPINELINK_MASTER`` (unless the caller already set it) to make the
builder inherit the submit-time configuration.
"""

import os
import sys


def main(argv: list[str]) -> int:
    os.environ.setdefault("SPINELINK_MASTER", "")
    from spinebasedrecordlinkage_jl_spark import cli

    return cli.main(argv)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
