"""bgpexplorer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wladwm/bgpexplorer (reference surveyed in
SURVEY.md; file:line citations in docstrings point into /root/reference).

Design stance (SURVEY.md §7): event-sourced, batch-first core. One
append-only ``rib_history`` event table plus analytic DataFrame views
replaces the reference's in-RAM nested BTreeMaps; the filter language is a
pure Column-expression compiler; streaming is an ingestion mode over the
same normalization, not a separate engine.
"""

__version__ = "0.1.0"

from bgpexplorer_spark.session import get_spark  # noqa: F401
