"""The reference's filter language (SURVEY.md §2.3 F1-F10), re-expressed as
a parser (terms.py) plus a 3-valued Column compiler (compile.py).

Public surface:

    from bgpexplorer_spark.filterlang import parse_filter, filter_to_column
    col = filter_to_column("rd:100:1000 10.0.0.0/16", rib="vpnv4u")
    rib_df.filter(col)   # col IS TRUE == the reference's Yes emission
"""

from bgpexplorer_spark.filterlang.compile import filter_to_column  # noqa: F401
from bgpexplorer_spark.filterlang.terms import parse_filter  # noqa: F401
