"""Python UDTFs (§2.10 surface): table-valued functions where one
input row yields a variable number of output rows.

The reference exposes row-expanding iteration as Python generator
protocols over its tables (e.g. BLAST hit parsing spawning HSP rows,
seqdb iteration); Spark's native equivalents (explode/posexplode,
inline, mapInPandas) cover the hot paths everywhere else in this repo
— a real ``@udtf`` belongs in the surface for the cases where the
expansion logic is genuinely imperative Python.

The classes are built inside factory functions so cloudpickle ships
them BY VALUE to Python workers (the repo is driver-side only — the
executors cannot ``import pygr_spark``; same convention as the nested
mapInPandas closures in operators/multimodal.py).
"""

from __future__ import annotations


def chunk_udtf(chunk_tokens: int = 32):
    """UDTF: LLM-ingestion document chunker — one output row per
    ``chunk_tokens``-token window of ``text`` (whitespace tokens,
    non-overlapping, last chunk ragged):
    (doc_id, chunk_no 1-based, chunk, n_tokens). Deliberately simple
    token rule so a SQL oracle (string_split + list slicing)
    reproduces it byte-for-byte — the UDTF *mechanism* (variable
    fan-out per row, LATERAL join, Arrow-batched eval where the
    runtime supports it) is what's under test; hot-path chunking
    elsewhere uses JVM-side explode (operators/pipeline.py)."""
    from pyspark.sql.functions import udtf

    n = int(chunk_tokens)

    class _Chunker:
        def eval(self, doc_id, text):
            toks = (text or "").split(" ")
            for j, a in enumerate(range(0, len(toks), n), 1):
                piece = toks[a : a + n]
                yield doc_id, j, " ".join(piece), len(piece)

    ret = "doc_id: bigint, chunk_no: bigint, chunk: string, n_tokens: bigint"
    try:
        return udtf(_Chunker, returnType=ret, useArrow=True)
    except TypeError:  # runtime without the useArrow kwarg
        return udtf(_Chunker, returnType=ret)
