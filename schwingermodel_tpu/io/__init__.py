"""Gauge-configuration and run-metadata I/O."""

from schwingermodel_tpu.io.ctxt import (
    conf_filename,
    read_conf,
    theta_from_links,
    links_from_theta,
    write_conf,
)
from schwingermodel_tpu.io.simdata import SimData, simdata_filename
from schwingermodel_tpu.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "conf_filename",
    "read_conf",
    "write_conf",
    "theta_from_links",
    "links_from_theta",
    "SimData",
    "simdata_filename",
    "save_checkpoint",
    "load_checkpoint",
]
