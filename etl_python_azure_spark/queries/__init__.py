"""Query registry: every SURVEY §2 operator (plus the LLM-pipeline
extensions) as a named (Spark builder, DuckDB oracle SQL) pair.

The driver contract (`__spark_entry__.py`) exposes this registry via
``queries()`` / ``oracle_sql()``; the builders exercise the library
operators in :mod:`..operators` / :mod:`..functions` so the oracle
diff is also an integration test of the engine code.

Determinism rules (so order-insensitive value hashes match DuckDB
exactly — see ``scripts/oracle_check.py``):

- Monetary/quantity sums go through exact DECIMAL accumulation and
  are cast back to DOUBLE (identical bit patterns both engines).
- Element-wise double arithmetic (``*``, ``/``) is written with the
  same operation order in both dialects — IEEE 754 makes it exact.
- Every top-k has a unique tiebreaker column in the ordering.
- Aliases match exactly between Spark and SQL (driver sorts columns
  by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry."""

    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI/DuckDB SQL; None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a builder to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(builder=fn, oracle=oracle)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    # Import side-effect populates _REGISTRY; registration order is
    # load-bearing: the correctness driver records the FIRST 50
    # entries, so the LLM-pipeline modules register before the
    # relational suite (all driver-green in round 1). With >50
    # registered, rotate per round: r02's window covers every
    # dedup/similarity/text/multimodal/corpus/streaming-equiv query
    # plus the events head; the events tail (positional_unnest,
    # views_ranged, similar_user — r01 local-green) and the newer
    # relational_extra/data-quality queries rotate into r03's window.
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import corpus  # noqa: F401
    from . import streaming_equiv  # noqa: F401
    from . import events  # noqa: F401
    from . import corpus_extra  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_extra  # noqa: F401

    return dict(_REGISTRY)
