"""Multi-host / multi-chip runtime (SURVEY.md §2.10 P1/P2/P8)."""

from .hosts import HostInfo, init_distributed, partition_ctl  # noqa: F401
