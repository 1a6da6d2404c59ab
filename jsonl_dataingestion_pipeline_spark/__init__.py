"""PySpark-native analytics / data-ingestion engine.

A ground-up re-expression of the capabilities of the reference pipeline
``ChowdhuryRajuMOLIT2025/jsonl_dataingestion_pipeline`` (surveyed in
/root/repo/SURVEY.md) on the Spark DataFrame/SQL stack, extended with the
operators a large-scale (100 TB) training-data pipeline needs: exact and
near deduplication, similarity search over embedding columns, multimodal
column plumbing, and text analysis.

Design rules (see SURVEY.md §7):
- DataFrame-first: every operator is a ``Column`` expression or DataFrame
  transform; Catalyst handles pushdown/pruning/codegen.
- No row-at-a-time Python in hot paths; Arrow-vectorized ``pandas_udf``
  only where built-ins genuinely cannot express the semantics.
- ``as_of`` (the "today" clock used by delay/status logic) is an explicit
  parameter everywhere, never a hidden wall-clock read.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
