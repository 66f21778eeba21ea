"""Sources & sinks (SURVEY.md §2.1).

The network-protocol sources (S1 BGP, S2 BMP) are ingestion adapters out of
scope for a batch engine; the ingest boundary is an ``updates`` event
DataFrame with schemas.UPDATES_SCHEMA. Snapshot persistence (S4/S5) is the
parquet table itself.
"""
