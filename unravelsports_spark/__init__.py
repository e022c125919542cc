"""unravelsports_spark — a PySpark-native spatiotemporal analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
UnravelSports/unravelsports (reference read-only at /root/reference, MPL-2.0)
on top of Apache Spark:

- canonical long-format tracking table (DataFrame), see `schema.py`
- relational pipeline stages (melt/window/join/group-by) as native Spark SQL
  expressions so Catalyst can push down, prune, and codegen them
- per-frame matrix kernels (graph conversion, pressing intensity, formation
  detection) as Arrow-backed grouped-map pandas UDFs (`applyInPandas`)
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB / many-executor
  clusters: broadcast dims, single-shuffle groupings, partition by game_id.

Nothing here is a port of the reference's Polars implementation; reference
file:line citations in docstrings identify the *behavior* being matched.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
