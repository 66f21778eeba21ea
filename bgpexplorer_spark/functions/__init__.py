"""Scalar function kits (SURVEY.md §2.6 C1-C9) — all pure Column algebra,
JVM-side / codegen-able; no Python UDFs in the query hot path."""
