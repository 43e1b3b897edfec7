"""Storage layer: Lance when importable, Parquet otherwise (SURVEY.md §4.3).

BASELINE.json names Lance tables as the at-scale format; this sandbox
has no ``pylance``, so every path here transparently falls back to
Parquet with identical schemas. All sinks write a *directory* of part
files (never one giant file) so output is shard-parallel and resumable.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - lance not installable in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None):
    """Path (file or directory) -> ray.data.Dataset, pruned at the read."""
    import ray.data as rd

    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns)  # pragma: no cover
    return rd.read_parquet(path, columns=columns)


def write_table(ds, path: str, *, min_rows_per_file: int | None = None):
    """Dataset -> directory of part files."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path)
        return
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(path, **kwargs)
