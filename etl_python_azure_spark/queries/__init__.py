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
- PROJECTED integer aggregates in the oracle are wrapped in
  ``CAST(... AS BIGINT)``: DuckDB ``SUM``/window-``SUM`` over
  integers returns HUGEINT, which pandas renders as float64 —
  an exact value match that still hash-mismatches in the driver's
  pandas-based compare. Same for DECIMAL-typed float literals
  (``1000000.0``) reaching an output column: force DOUBLE.
  ``scripts/dtype_audit.py`` (also folded into oracle_check)
  catches violations.
- Transcendentals: JVM ``Math.exp`` and libm ``exp`` disagree by
  1 ulp on some inputs — never project ``exp()`` of a computed
  double (``ln`` has matched empirically; keep it monitored by the
  sf0.001/sf0.01 sweeps).
- NO array/map/struct columns in query output: the driver's pandas
  canonicalizer sorts rows before hashing and raises ``unhashable
  type: 'list'`` on nested cells (r03 red rows). Prove array ops
  with scalar probes (fold sums, element copies, sizes) and keep
  raw-array forms under pytest. ``scripts/dtype_audit.py`` and
  ``scripts/oracle_check.py`` both enforce this.
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


# The correctness driver records the FIRST 50 registry entries each
# round, so ordering is load-bearing. r01 covered the relational
# suite; r02 covered dedup/similarity/text/multimodal/corpus/
# streaming-equiv plus the events head. The r03 window pins, in
# order: the three r02 hash-mismatch queries (fixed this round —
# HUGEINT casts), every query never yet driver-checked, and the new
# round-3 surface. Everything else (double-green in r01/r02) follows.
_R03_WINDOW = [
    # fixed in round 3 (r02 hash_match=false → re-prove)
    "sequence_packing",
    "corpus_curation_pipeline",
    "avg_inter_event_gap",
    # never driver-checked (r01 ∪ r02 miss), prior registration order
    "daily_activity_gapfill",
    "positional_unnest_embeddings",
    "views_before_purchase_ranged",
    "similar_user_activity",
    "document_chunks",
    "oov_rate_by_lang",
    "retention_cohorts",
    "embedding_dim_stats",
    "boilerplate_removal",
    "temperature_mixture",
    "daily_peak_concurrency",
    "window_function_toolbox",
    "moving_avg_order_price",
    "supplier_variety_by_part",
    "bilateral_trade_volume",
    "variant_props_rollup",
    "unpivot_order_metrics",
    "array_toolbox_embeddings",
    "filtered_aggregates",
    "salted_quantity_by_flag",
    "profile_orders_columns",
    "priority_orders_with_big_items",
    "dominant_part_suppliers",
    "sole_late_suppliers",
    "min_cost_supplier_per_part",
    "returned_item_customers",
    "top_revenue_supplier",
    "small_quantity_revenue_loss",
    "disjunctive_band_revenue",
    "nation_market_share",
    "profit_by_nation_year",
    "data_quality_report",
    "forecast_revenue_change",
    "winsorized_order_stats",
    # new in round 3
    "passage_dup_stats",
    "cluster_safe_splits",
    "tokenizer_fertility_by_lang",
    "late_ship_priority_orders",
    "event_transition_matrix",
    "rolling_7d_active_users",
    "decile_spend_profile",
    "session_funnel",
    "source_lang_affinity",
    "media_frame_sample",
    "stateful_session_equiv",
    "join_key_skew_profile",
    "incremental_dedup_pairs",
]


def registry() -> dict[str, QuerySpec]:
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
    from . import round3  # noqa: F401

    ordered = {n: _REGISTRY[n] for n in _R03_WINDOW if n in _REGISTRY}
    ordered.update({n: s for n, s in _REGISTRY.items() if n not in ordered})
    return ordered
