"""External-process source (S9): run a command-line tool per
partition, streaming rows through its stdin/stdout.

Reference: BlastMapping runs blastall/megablast/formatdb as
subprocesses and parses their stdout (blast.py:86-117 start_blast/
process_blast, 215-236 run_formatdb). Spark shape (SURVEY.md S9):
``mapInPandas`` — each partition serializes its rows to the tool's
input format, invokes one subprocess, and parses the output back to
rows. The driver never sees the data; N partitions = N concurrent
tool processes, which is the reference's Coordinator-based fan-out
(coordinator.py) replaced by the Spark scheduler.

The domain tools (blastall, RepeatMasker) are not in this container,
so tests exercise the plumbing with POSIX text tools; the contract is
identical: cmd: list[str], fmt: row → input text, parse: stdout line →
row dicts.
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def run_external_tool(
    df: DataFrame,
    cmd: list[str],
    fmt: Callable[[dict], str],
    parse: Callable[[str], list[dict]],
    schema: T.StructType,
    batch_rows: int | None = None,
) -> DataFrame:
    """Pipe each partition through ``cmd``: rows → fmt → stdin;
    stdout → parse → rows of ``schema``. One subprocess per Arrow
    batch (bound memory; set ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` or ``batch_rows`` to size it)."""

    out_cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chunks = (
                [pdf[i : i + batch_rows] for i in range(0, len(pdf), batch_rows)]
                if batch_rows
                else [pdf]
            )
            for chunk in chunks:
                if chunk.empty:
                    continue
                text = "".join(fmt(row._asdict()) for row in chunk.itertuples(index=False))
                proc = subprocess.run(
                    cmd,
                    input=text,
                    capture_output=True,
                    text=True,
                    check=True,
                )
                rows: list[dict] = []
                for line in proc.stdout.splitlines():
                    rows.extend(parse(line))
                yield pd.DataFrame(rows, columns=out_cols)

    return df.mapInPandas(run, schema)


def fasta_formatter(id_col: str = "id", seq_col: str = "seq") -> Callable[[dict], str]:
    """Row → FASTA record (the input format of the reference's blast
    wrappers, blast.py:60-70)."""

    def fmt(row: dict) -> str:
        return f">{row[id_col]}\n{row[seq_col]}\n"

    return fmt
