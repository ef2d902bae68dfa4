"""End-to-end pipeline restatements (SURVEY §3) as lazy Spark DAGs."""

from .latinad import run_latinad  # noqa: F401
from .sercom import run_sercom  # noqa: F401
