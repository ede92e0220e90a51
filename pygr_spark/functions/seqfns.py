"""Sequence-domain scalar functions, all pure Column expressions
(SURVEY.md §2.8 F1-F7) — no UDFs in the hot path.

Reference semantics:
  - reverse complement: class-level ``_complement`` dict + reversed
    join (reference sequence.py:513-520);
  - python-slice with clipping: SeqPath construction clips to bounds
    (sequence.py:302-306), empty slices are errors (307-308),
    negative indices count from the end;
  - seqtype guess by letter ratio (sequtil.py:7-26);
  - IUPAC-degenerate codon translation (sequtil.py:121-159), partial
    / unknown codons → 'X';
  - six-frame coordinates (translationDB.py:104-115).

Goldens: reference tests/sequence_test.py:10-91 → tests/test_seqfns.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DNA_SEQTYPE, RNA_SEQTYPE, PROTEIN_SEQTYPE = 0, 1, 2

_COMP_SRC = "acgtunACGTUN"
_COMP_DST = "tgcaanTGCAAN"

#: expanded genetic code (reference sequtil.py:121-141 AATranslation)
_CODE_DEGENERATE = dict(
    TTY="F", TTR="L", TCN="S", TAY="Y", TGY="C", TGG="W",
    CTN="L", CCN="P", CAY="H", CAR="Q", CGN="R",
    ATY="I", ATA="I", ATG="M", ACN="T", AAY="N", AAR="K",
    AGY="S", AGR="R",
    GTN="V", GCN="A", GAY="D", GAR="E", GGN="G",
    TAR="*", TGA="*",
)


def _expand_code() -> dict[str, str]:
    code = dict(_CODE_DEGENERATE)
    for codon, aa in _CODE_DEGENERATE.items():
        stem = codon[:2]
        if codon[2] == "N":
            for b in "ATGC":
                code[stem + b] = aa
        elif codon[2] == "Y":
            for b in "TC":
                code[stem + b] = aa
        elif codon[2] == "R":
            for b in "AG":
                code[stem + b] = aa
    return {k: v for k, v in code.items() if k[2] in "ACGT"}


GENETIC_CODE = _expand_code()


def revcomp(seq: Column) -> Column:
    """Reverse complement (F1) — pure builtins, codegen-friendly."""
    return F.reverse(F.translate(seq, _COMP_SRC, _COMP_DST))


def seq_slice(seq: Column, start: Column, stop: Column | None = None) -> Column:
    """Python-slice semantics on a 1-row-per-sequence string column:
    negative indices from the end, clipping to bounds (reference
    sequence.py:302-306). Returns NULL for empty results — the
    relational stand-in for pygr's IndexError (sequence.py:307-308);
    filter on isNotNull() to reproduce the raise."""
    n = F.length(seq)
    s = F.when(start < 0, F.greatest(n + start, F.lit(0))).otherwise(
        F.least(start, n)
    )
    if stop is None:
        e = n
    else:
        e = F.when(stop < 0, F.greatest(n + stop, F.lit(0))).otherwise(
            F.least(stop, n)
        )
    out = F.substring(seq, (s + 1).cast("int"), (e - s).cast("int"))
    return F.when(s < e, out)


def guess_seqtype(seq: Column) -> Column:
    """0=DNA, 1=RNA, 2=protein by letter ratio (sequtil.py:7-26)."""
    n = F.length(seq)
    ndna = n - F.length(F.translate(seq, "AaTtUuGgCcNn", ""))
    nt = n - F.length(F.translate(seq, "Tt", ""))
    nu = n - F.length(F.translate(seq, "Uu", ""))
    return (
        F.when(ndna / n > 0.85, F.when(nt > nu, DNA_SEQTYPE).otherwise(RNA_SEQTYPE))
        .otherwise(PROTEIN_SEQTYPE)
        .cast("int")
    )


def translate_orf(seq: Column) -> Column:
    """Nucleotide → amino-acid string; partial/unknown codons → 'X'
    (sequtil.py:143-159). Map-literal lookup over codon positions."""
    entries = []
    for codon, aa in sorted(GENETIC_CODE.items()):
        entries.append(F.lit(codon))
        entries.append(F.lit(aa))
    code = F.create_map(*entries)
    s = F.translate(F.upper(seq), "U", "T")
    n_codons = F.ceil(F.length(s) / 3).cast("int")
    idx = F.when(n_codons > 0, F.sequence(F.lit(0), n_codons - 1)).otherwise(
        F.array().cast("array<int>")
    )
    aas = F.transform(
        idx, lambda i: F.coalesce(code[F.substring(s, i * 3 + 1, 3)], F.lit("X"))
    )
    return F.concat_ws("", aas)


def six_frames(df: DataFrame, id_col: str = "id", seq: str = "seq") -> DataFrame:
    """Generated six-reading-frame view (TranslationDB semantics,
    translationDB.py:76-131): one row per (sequence, frame) with the
    frame's nucleotide slice, its protein translation, and the frame
    coordinates back onto the original sequence."""
    frames = F.array(*[F.lit(x) for x in [1, 2, 3, -1, -2, -3]])
    out = df.select(
        F.col(id_col), F.col(seq).alias("_seq"), F.explode(frames).alias("frame")
    )
    offset = F.abs(F.col("frame")) - 1
    fwd = F.col("frame") > 0
    oriented = F.when(fwd, F.col("_seq")).otherwise(revcomp(F.col("_seq")))
    n = F.length("_seq")
    aa_len = F.floor((n - offset) / 3).cast("long")
    frame_seq = F.substring(oriented, (offset + 1).cast("int"), (aa_len * 3).cast("int"))
    return out.select(
        id_col,
        "frame",
        offset.cast("long").alias("offset"),
        aa_len.alias("aa_length"),
        frame_seq.alias("frame_seq"),
        translate_orf(frame_seq).alias("protein"),
    ).filter(F.col("aa_length") > 0)
