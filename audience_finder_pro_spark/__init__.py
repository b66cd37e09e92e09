"""audience_finder_pro_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query semantics of the reference app
``BoydDataEngineer/audience-finder-pro`` (a single-file Streamlit/pandas
program; see SURVEY.md) as an idiomatic Apache Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; no custom IR),
- broadcast theta-joins for keyword matching (SURVEY §2.3 J1/J2),
- groupBy + collect_set for the reference's dict-upsert aggregation
  (SURVEY §2.4 A1/A2), window functions for its per-group limits,
- plus the LLM-data-pipeline tier: dedup (exact/MinHash/SimHash/Jaccard),
  embedding similarity search, text analysis, multimodal column plumbing,
  and a Structured Streaming tier over the events table.

Every operator is designed for a 1000-executor / 100 TB deployment and
verified at small scale against a DuckDB oracle (tests/oracle.py).
"""

from audience_finder_pro_spark.session import get_spark, load_table, register_catalog

__all__ = ["get_spark", "load_table", "register_catalog"]

__version__ = "0.1.0"
