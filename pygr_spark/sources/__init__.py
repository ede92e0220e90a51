"""Scans/sources/sinks (SURVEY.md §2.1): FASTA, MAF, BLAST parsers as
distributed readers producing DataFrames."""
