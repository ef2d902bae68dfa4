"""etl_python_azure_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
repo ``IgnacioOrtuzar/ETL-Python-Azure`` (two pandas-based Azure
Function ETL pipelines) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; nothing is
  hand-scheduled),
- columnar Parquet-first storage, broadcast joins for dimensions,
  AQE for shuffle sizing/skew,
- Arrow-vectorized Pandas UDFs only where built-ins genuinely
  cannot express the semantics (distributed HTTP fan-out,
  multimodal decode),
- plus the large-scale training-data-pipeline operators the
  reference lacks: dedup (exact/MinHash-LSH/SimHash/n-gram
  Jaccard/embedding-cosine), similarity search, text analysis and
  multimodal column plumbing.

Layout:

- :mod:`.session`    — SparkSession factory (tuned for local + cluster)
- :mod:`.functions`  — scalar Column-expression helpers (SURVEY §2.7)
- :mod:`.operators`  — relational + extension operators (SURVEY §2.3–2.8)
- :mod:`.sources`    — REST/JDBC/file ingestion (SURVEY §2.1)
- :mod:`.sinks`      — JDBC/file loads, full-refresh, ranged overwrite (§2.2)
- :mod:`.streaming`  — micro-batch/incremental semantics (§2.9)
- :mod:`.plans`      — end-to-end pipeline restatements (§3)
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
