"""Filesystem seam for the lake's metadata/data-file operations.

The lake's driver-side file operations go through these functions instead of
raw ``os`` calls so a cluster deployment swaps ONE module: each function maps
1:1 onto the Hadoop FileSystem API (``FileSystem.listStatus`` /
``getFileStatus`` / ``delete(recursive)``), reachable from PySpark via
``spark._jvm.org.apache.hadoop.fs`` without extra dependencies. The local
implementation keeps tests hermetic and fast.
"""

from __future__ import annotations

import os
import shutil


def list_dir(path: str) -> list[str]:
    """Sorted child names of a directory ([] when absent) — FileSystem.listStatus."""
    if not os.path.isdir(path):
        return []
    return sorted(os.listdir(path))


def is_dir(path: str) -> bool:
    return os.path.isdir(path)


def remove_dir(path: str) -> None:
    """Recursive delete, ignore-missing — FileSystem.delete(path, true)."""
    shutil.rmtree(path, ignore_errors=True)


def file_size(path: str) -> int:
    """Size in bytes (0 when absent) — FileStatus.getLen."""
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def rename_dir(src: str, dst: str) -> None:
    """Directory move — FileSystem.rename. Same-filesystem metadata op on
    the local implementation (and on HDFS); callers must treat it as
    non-atomic-across-stores (object stores emulate rename by copy)."""
    os.rename(src, dst)


def remove_file(path: str) -> None:
    """Single-file delete, ignore-missing — FileSystem.delete(path, false)."""
    try:
        os.remove(path)
    except OSError:
        pass
