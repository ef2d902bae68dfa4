"""Sinks (SURVEY §2.2): file-based full-refresh / ranged overwrite /
multi-table loads, and JDBC append / truncate-refresh / upsert.
"""

from .files import (  # noqa: F401
    full_refresh,
    multi_table_load,
    ranged_overwrite,
)
from .jdbc import (  # noqa: F401
    jdbc_append,
    jdbc_full_refresh,
    jdbc_upsert,
)
