"""Sources (SURVEY §2.1): REST ingestion (driver + distributed
fan-out with per-row error capture) and JDBC probe reads.
"""

from .rest import (  # noqa: F401
    distributed_fetch,
    fetch_json,
    paginated_fetch,
    records_to_df,
    urllib_transport,
)
from .jdbc import jdbc_query  # noqa: F401
