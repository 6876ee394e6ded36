"""Output sinks with downstream-join-friendly layout.

``write_bucketed`` persists a doc_id-keyed table bucketed (and sorted)
by ``doc_id``: every later join or groupBy on ``doc_id`` — span joins,
lineage reconciliation, dedup-verdict application — reads the bucketing
from the table metadata and runs with ZERO exchanges (verified by
``tests/test_plans.py``). At 10^12-doc scale this converts the most
common downstream access pattern from a full shuffle into a co-located
merge, the parquet/warehouse analog of Iceberg's bucket partition
transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 64,
                   mode: str = "overwrite", path: str | None = None) -> None:
    """Persist ``df`` as a table bucketed+sorted by doc_id.

    With ``path`` the table is EXTERNAL (data under ``path``, bucketing
    metadata in the session catalog) — scratch materializations can then
    live under a temp directory instead of the warehouse dir, which is
    relative to whatever CWD the driver process happens to have."""
    w = df.write.bucketBy(n_buckets, "doc_id").sortBy("doc_id").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
