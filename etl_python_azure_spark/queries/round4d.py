"""Round-4d registry surface: embedding PCA, drift monitoring,
association rules, graph triangles, target encoding, and the native
session-window rollup.

- top principal component of the embedding table (relational
  covariance + replayable power iteration — embedding-anisotropy
  diagnostics)
- PSI value-drift report between the event stream's first and
  second halves (the scorecard drift metric)
- association rules (support / confidence / lift) over per-user-day
  event baskets
- per-nation triangle counts on the trade graph (clustering
  structure; complements PageRank)
- m-estimate target encoding of customer market segments
- gap sessions via Spark's NATIVE ``session_window`` (proves the
  built-in operator ≡ the window-function sessionization the
  engine also ships)

Determinism notes: PCA follows the PageRank/PQ discipline — every
float product is floor-quantized to an 1e-12 integer grid before
summing, big integer sums cross engines via the VARCHAR-cast
round-trip, sqrt/divisions are IEEE-exact; PSI quantizes each ln to
1e-8 and folds the per-bin terms in sorted order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# --------------------------------------------------------------------------
# PCA top component over embeddings.
# --------------------------------------------------------------------------
_PCA_DIM = 64
_PCA_ITERS = 3


def _pca_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-once covariance matrix for *sf_dir*'s embeddings (d²-row
    frame, localCheckpoint-ed). The covariance subtree is the shared
    ~2/3 of every PCA-family query (`pca_top_component`,
    `pca_top2_components`, `label_projection_stats`); a real
    pipeline fits it once and serves all consumers (r04 verdict
    item 6). NOTE this does not contradict the pca.py:111 no-persist
    rule — that rule is about persisting cov INSIDE one lazy plan
    (where ReusedExchange already dedupes); this materializes once
    ACROSS separate queries/jobs, where lineage re-execution is
    real. See queries/_artifacts.py for the cache contract."""
    from ..operators.pca import covariance_matrix
    from ._artifacts import fit_once

    def build():
        em = load_tables(spark, sf_dir, "embeddings")
        return covariance_matrix(em).localCheckpoint(eager=True)

    return fit_once(spark, sf_dir, "pca_cov", build)


def _pca_comp1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-once top principal component (64-row frame: i, loading,
    eigenvalue) derived from `_pca_cov`."""
    from ..operators.pca import power_iteration_top_component
    from ._artifacts import fit_once

    def build():
        return power_iteration_top_component(
            _pca_cov(spark, sf_dir), dim=_PCA_DIM, n_iter=_PCA_ITERS
        ).localCheckpoint(eager=True)

    return fit_once(spark, sf_dir, "pca_comp1", build)


from ._artifacts import register_prewarm as _register_prewarm  # noqa: E402

_register_prewarm(
    "pca_comp1",
    _pca_comp1,
    consumers={
        "pca_top_component", "pca_top2_components",
        "label_projection_stats",
    },
)


def _pca_cte_chain(dim: int, iters: int) -> tuple[list[str], str]:
    """The CTE chain replaying covariance + power iteration; returns
    (ctes, name of the final unit eigenvector CTE) so composing
    oracles (`round4g.label_projection_stats`,
    `round4i.pca_top2_components`) can reuse it."""
    d1 = dim + 1
    ctes = [
        f"""ex AS (
      SELECT vec_id, CAST(u.i AS INT) - 1 AS i,
             CAST(embedding[u.i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, {d1})) AS u(i)
    )""",
        """mu AS (
      SELECT i,
             CAST(SUM(CAST(floor(x * 1e10) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS mu
      FROM ex GROUP BY i
    )""",
        """nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)""",
        """cx AS (
      SELECT e.vec_id, e.i, e.x - m.mu AS xc
      FROM ex e JOIN mu m USING (i)
    )""",
        f"""cov AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             (({_BIGSUM.format(expr="a.xc * b.xc")}
               / CAST(1e12 AS DOUBLE)) / CAST(nv.n AS DOUBLE)) AS cov
      FROM cx a JOIN cx b ON a.vec_id = b.vec_id CROSS JOIN nv
      GROUP BY a.i, b.i, nv.n
    )""",
    ]
    power, prev = _power_ctes("cov", "", dim, iters)
    return ctes + power, prev


_BIGSUM = (
    "CAST(CAST(SUM(CAST(floor({expr} * CAST(1e12 AS DOUBLE))"
    " AS BIGINT)) AS VARCHAR) AS DOUBLE)"
)


def _power_ctes(
    cov_name: str, sfx: str, dim: int, iters: int
) -> tuple[list[str], str]:
    """Power-iteration CTEs over an existing (i, j, cov) CTE named
    *cov_name*; all intermediate names carry *sfx* so two chains
    (e.g. first + deflated second component) coexist in one WITH."""
    d1 = dim + 1
    ctes = [f"""v0{sfx} AS (
      SELECT CAST(u.i AS INT) - 1 AS i,
             (CAST(1.0 AS DOUBLE) / sqrt(CAST({dim} AS DOUBLE))) AS v
      FROM UNNEST(range(1, {d1})) AS u(i)
    )"""]
    prev = f"v0{sfx}"
    for r in range(1, iters + 1):
        ctes.append(f"""u{r}{sfx} AS (
      SELECT c.i,
             ({_BIGSUM.format(expr="c.cov * v.v")}
              / CAST(1e12 AS DOUBLE)) AS u
      FROM {cov_name} c JOIN {prev} v ON c.j = v.i
      GROUP BY c.i
    )""")
        ctes.append(f"""nrm{r}{sfx} AS (
      SELECT sqrt({_BIGSUM.format(expr="u * u")}
                  / CAST(1e12 AS DOUBLE)) AS nrm
      FROM u{r}{sfx}
    )""")
        ctes.append(f"""v{r}{sfx} AS (
      SELECT i, (u / nrm) AS v FROM u{r}{sfx} CROSS JOIN nrm{r}{sfx}
    )""")
        prev = f"v{r}{sfx}"
    ctes.append(f"""uf{sfx} AS (
      SELECT c.i,
             ({_BIGSUM.format(expr="c.cov * v.v")}
              / CAST(1e12 AS DOUBLE)) AS u
      FROM {cov_name} c JOIN {prev} v ON c.j = v.i
      GROUP BY c.i
    )""")
    ctes.append(f"""lam{sfx} AS (
      SELECT ({_BIGSUM.format(expr="uf.u * v.v")}
              / CAST(1e12 AS DOUBLE)) AS eigenvalue
      FROM uf{sfx} uf JOIN {prev} v USING (i)
    )""")
    return ctes, prev


def _pca_oracle(dim: int, iters: int) -> str:
    ctes, prev = _pca_cte_chain(dim, iters)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT v.i, v.v AS loading, lam.eigenvalue
    FROM {prev} v CROSS JOIN lam
    """
    )


@register("pca_top_component", _pca_oracle(_PCA_DIM, _PCA_ITERS))
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus: exact
    fixed-point covariance (d² relational aggregate — network cost
    d²·partitions, never n·d²) + 3 power iterations on the d²-row
    covariance frame, every product 1e-12-quantized so the DuckDB
    oracle replays the full trajectory. `eigenvalue` is the Rayleigh
    quotient — the top-axis variance an anisotropy check reads.
    Fitted once per process via `_pca_comp1` (bit-identical to a
    fresh fit; the first consumer trains for real)."""
    return _pca_comp1(spark, sf_dir)


# --------------------------------------------------------------------------
# PSI drift between the stream's first and second halves.
# --------------------------------------------------------------------------
_PSI_BINS = 10


@register(
    "psi_value_drift",
    f"""
    WITH tspan AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0,
             date_diff('day', MIN(CAST(ts AS DATE)),
                       MAX(CAST(ts AS DATE))) + 1 AS nd
      FROM events
    ),
    vspan AS (
      SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE CAST(least({_PSI_BINS - 1}, CAST(floor(
                    (e.value - s.mn) / (s.mx - s.mn)
                    * CAST({_PSI_BINS} AS DOUBLE)) AS INT)) AS INT)
             END AS bin,
             CASE WHEN date_diff('day', t.d0, CAST(e.ts AS DATE)) * 2
                       >= t.nd THEN 1 ELSE 0 END AS b
      FROM events e JOIN vspan s USING (event_type) CROSS JOIN tspan t
    ),
    counts AS (
      SELECT event_type, bin,
             SUM(1 - b) AS na, SUM(b) AS nb
      FROM binned GROUP BY event_type, bin
    ),
    tots AS (
      SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb
      FROM counts GROUP BY event_type
    ),
    dense AS (
      SELECT t.event_type, t.ta, t.tb, sp.bin,
             COALESCE(c.na, 0) AS na, COALESCE(c.nb, 0) AS nb
      FROM tots t
      CROSS JOIN (SELECT CAST(UNNEST(range(0, {_PSI_BINS})) AS INT)
                    AS bin) sp
      LEFT JOIN counts c
        ON c.event_type = t.event_type AND c.bin = sp.bin
    ),
    terms AS (
      SELECT event_type, ta, tb,
             (((na + 1.0) / (ta + {_PSI_BINS}.0))
              - ((nb + 1.0) / (tb + {_PSI_BINS}.0)))
             * (floor(ln(((na + 1.0) / (ta + {_PSI_BINS}.0))
                         / ((nb + 1.0) / (tb + {_PSI_BINS}.0)))
                      * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE))
               AS term
      FROM dense
    )
    SELECT event_type, CAST(MIN(ta) AS BIGINT) AS n_a,
           CAST(MIN(tb) AS BIGINT) AS n_b,
           list_reduce(list_sort(list(term)), (acc, x) -> acc + x) AS psi
    FROM terms GROUP BY event_type
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of the event value per event type
    between the observation window's first and second halves —
    the drift monitor a production feed runs before retraining.
    Fixed equal-width bins from EACH TYPE'S min/max (no quantile
    estimation; a narrow-ranged type still spreads across all
    bins), Laplace-smoothed shares, and every bin contributes a
    term even when empty in both halves."""
    from ..operators.drift import psi_report

    e = load_tables(spark, sf_dir, "events")
    d = F.to_date(F.col("ts"))
    span = e.agg(
        F.min(d).alias("__d0"),
        (F.datediff(F.max(d), F.min(d)) + 1).alias("__nd"),
    )
    e2 = e.crossJoin(F.broadcast(span))
    is_b = (F.datediff(d, F.col("__d0")) * 2) >= F.col("__nd")
    return psi_report(
        e2, "value", ["event_type"], is_b, n_bins=_PSI_BINS
    )


# --------------------------------------------------------------------------
# Association rules over per-user-day event baskets.
# --------------------------------------------------------------------------
@register(
    "event_pair_rules",
    """
    WITH it AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      FROM events
    ),
    nb AS (
      SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, d FROM it)
    ),
    cnt AS (SELECT event_type, COUNT(*) AS c FROM it GROUP BY 1),
    p AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             COUNT(*) AS n_xy
      FROM it a JOIN it b
        ON a.user_id = b.user_id AND a.d = b.d
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(x.c AS BIGINT) AS n_x, CAST(y.c AS BIGINT) AS n_y,
           CAST(nb.n AS BIGINT) AS n_baskets,
           (CAST(n_xy AS DOUBLE) / CAST(nb.n AS DOUBLE)) AS support,
           (CAST(n_xy AS DOUBLE) / CAST(x.c AS DOUBLE)) AS conf_a_to_b,
           (CAST(n_xy AS DOUBLE) / CAST(y.c AS DOUBLE)) AS conf_b_to_a,
           (CAST(n_xy * nb.n AS DOUBLE) / CAST(x.c * y.c AS DOUBLE))
             AS lift
    FROM p
    JOIN cnt x ON x.event_type = p.item_a
    JOIN cnt y ON y.event_type = p.item_b
    CROSS JOIN nb
    """,
)
def event_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support / confidence / lift for every unordered pair of event
    types co-occurring in a (user, day) basket — the association
    metrics behind co-occurrence recommenders. Baskets dedup in one
    aggregate; the pair pass is a self-equi-join on the basket key
    (Σ|basket|², the a-priori shape); metrics are exact-integer
    ratios."""
    from ..operators.baskets import basket_pair_stats

    e = load_tables(spark, sf_dir, "events")
    items = e.select(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    )
    return basket_pair_stats(items, ["user_id", "d"], "event_type")


# --------------------------------------------------------------------------
# Triangle counts on the nation trade graph.
# --------------------------------------------------------------------------
@register(
    "nation_triangle_counts",
    """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    -- MATERIALIZED is load-bearing: und is referenced 4× and DuckDB
    -- inlines non-materialized CTEs, replanning the whole lineitem
    -- join per reference (288 s vs 0.1 s at sf0.1)
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0 WHERE src <> dst
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.c
      FROM und e1
      JOIN (SELECT a AS b, b AS c FROM und) e2 USING (b)
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.c
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und
      )
    ),
    pn AS (
      SELECT node, COUNT(*) AS n FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT nodes.node, CAST(COALESCE(pn.n, 0) AS BIGINT) AS n_triangles
    FROM nodes LEFT JOIN pn USING (node)
    """,
)
def nation_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation in the undirected
    supplier-nation → customer-nation trade graph — the clustering
    structure PageRank's rank vector can't see. Two hash equi-joins
    on canonicalized (lo, hi) edges; each triangle counted once."""
    from ..operators.graph import triangle_counts

    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier"
    )
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
    )
    return triangle_counts(edges)


# --------------------------------------------------------------------------
# m-estimate target encoding of customer segments.
# --------------------------------------------------------------------------
_TE_M = 10.0


@register(
    "segment_target_encoding",
    f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(o.o_totalprice AS DECIMAL(28,2)) AS t
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
      SELECT CAST(SUM(t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS global_mean
      FROM j
    ),
    per AS (
      SELECT seg, CAST(SUM(t) AS DOUBLE) AS s, COUNT(*) AS n
      FROM j GROUP BY seg
    )
    SELECT seg AS c_mktsegment, CAST(n AS BIGINT) AS n,
           (s / CAST(n AS DOUBLE)) AS cat_mean, global_mean,
           ((s + CAST({_TE_M} AS DOUBLE) * global_mean)
            / (CAST(n AS DOUBLE) + CAST({_TE_M} AS DOUBLE))) AS encoded
    FROM per CROSS JOIN g
    """,
)
def segment_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate (m=10) target encoding of `c_mktsegment` against
    order value — the shrunken-mean categorical feature every
    tabular model pipeline derives. Decimal-exact sums; one hash
    aggregate per level + a 1-row broadcast global mean; the output
    table broadcast-joins back onto facts to materialize the
    feature."""
    from ..operators.features import m_estimate_encode

    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(
        F.broadcast(t["customer"]),
        t["orders"].o_custkey == t["customer"].c_custkey,
    )
    return m_estimate_encode(j, "c_mktsegment", "o_totalprice", m=_TE_M)


# --------------------------------------------------------------------------
# Native session_window rollup (batch twin of the streaming path).
# --------------------------------------------------------------------------
@register(
    "native_session_rollup",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def native_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions via Spark's NATIVE `session_window` aggregate —
    one groupBy, no window-function pass — proving the built-in
    operator produces exactly the window-function sessionization
    (`sessionize_events`) plus decimal-exact value sums. This is the
    batch twin of the streaming session path; in Structured
    Streaming the same expression runs with a watermark and merges
    sessions across micro-batches."""
    e = load_tables(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
