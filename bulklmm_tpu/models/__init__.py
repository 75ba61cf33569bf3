"""Scan engines (the model families of the framework)."""

from .bulkscan import (
    bulkscan,
    bulkscan_alt_grid,
    bulkscan_null,
    bulkscan_null_grid,
    grid_null_ell,
)
from .bulkperm import BulkPermResult, bulkscan_perms
from .loco import (
    bulkscan_loco, bulkscan_perms_loco, loco_kinship, scan_loco,
)
from .results import BulkScanResult, ScanResult
from .streaming import bulkscan_perms_streamed, bulkscan_streamed
from .scan import scan, scan_perms_lite

__all__ = [
    "bulkscan",
    "bulkscan_alt_grid",
    "bulkscan_null",
    "bulkscan_null_grid",
    "grid_null_ell",
    "bulkscan_streamed",
    "bulkscan_loco",
    "bulkscan_perms",
    "bulkscan_perms_loco",
    "bulkscan_perms_streamed",
    "BulkPermResult",
    "loco_kinship",
    "scan_loco",
    "BulkScanResult",
    "ScanResult",
    "scan",
    "scan_perms_lite",
]
