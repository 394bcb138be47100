"""Auxiliary subsystems: I/O, config, profiling, debug checks."""

from .io import (
    load_checkpoint,
    save_checkpoint,
    save_levelset,
    save_tags,
    write_vti,
    write_vtu,
    write_vtu_umesh,
    write_xdmf,
)
from .config import SchemeConfig, load_config
from .profiling import Timer, report_throughput
from .sync import fetch_all

__all__ = [
    "save_levelset",
    "save_tags",
    "fetch_all",
    "write_vtu",
    "write_vtu_umesh",
    "write_vti",
    "write_xdmf",
    "save_checkpoint",
    "load_checkpoint",
    "SchemeConfig",
    "load_config",
    "Timer",
    "report_throughput",
]
