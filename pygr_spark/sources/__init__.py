"""Scans/sources/sinks (SURVEY.md §2.1): FASTA, MAF, BLAST parsers as
distributed readers producing DataFrames."""

from __future__ import annotations

import types


def ship_to_workers(mod: types.ModuleType) -> None:
    """Serialize ``mod`` by value when its functions are shipped to
    Python workers. Module-level parser functions are otherwise
    cloudpickled *by reference*, which requires the pygr_spark package
    to be importable on every executor — not true when the driver adds
    the repo to ``sys.path`` manually (no PYTHONPATH/addPyFile)."""
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        register_pickle_by_value(mod)
    except Exception:  # pragma: no cover - old pyspark without the API
        pass
