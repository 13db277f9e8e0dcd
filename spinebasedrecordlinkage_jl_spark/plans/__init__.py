"""Driver-side pipelines: the run_linkage orchestration loop."""

from .run_linkage import LinkageRun, run_linkage

__all__ = ["LinkageRun", "run_linkage"]
