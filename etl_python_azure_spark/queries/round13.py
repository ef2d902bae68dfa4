"""Round-13 registry surface.

- ``sidecar_compaction_equiv`` — the sidecar-backed exact+span admit
  fold (shared body with ``dedup_sidecar_equiv``) with
  ``compact_sidecars`` run BETWEEN batches (after batch 0's append):
  every sidecar table is distinct-folded, range-partitioned and
  sorted by its probe key, and swapped in under the maintenance
  lock. The oracle is the same
  reprojection-semantics fold (`_ssde_oracle`), so a green row
  proves the compaction swap preserves probe semantics mid-ingest —
  the property the size-triggered `maybe_compact_sidecars` policy in
  `curate_increment`/`streaming_curated_ingest` relies on every time
  it fires. Span window 10 (vs the uncompacted twin's 8) so the two
  rows cannot be conflated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register
from .round11 import _ssde_oracle
from .round12 import _sidecar_admit_fold

_SCE_W = 10
_SCE_BATCHES = 3


@register("sidecar_compaction_equiv", _ssde_oracle(_SCE_BATCHES, _SCE_W))
def sidecar_compaction_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_sidecar_equiv``'s admit fold with a compaction after
    batch 0: batch 1 probes freshly-rewritten tables (distinct +
    probe-key sort + lock-protected swap), and batch 2 probes the
    MIXED state — compacted files plus batch 1's post-compaction
    appends — which is exactly the state production probes see after
    the size-triggered policy fires mid-ingest. Equivalence against
    the reprojection oracle pins that compaction changes COST, never
    admit decisions. (One compaction, not one per batch: the mixed
    compacted+appended probe state is the representative one, and
    repeat-compaction semantics are pytest-pinned separately.)
    """
    return _sidecar_admit_fold(
        spark,
        sf_dir,
        _SCE_BATCHES,
        _SCE_W,
        compact_after=frozenset({0}),
    )
