"""Graph-frames parquet sink/source (S4) and framework adapters.

The reference serializes graph tuples to gzip-pickle
(default_graph_converter.py:250-278); the Spark-native equivalent is parquet
with nested arrays + shape columns, partitioned by game_id so per-match work
stays partition-local on read-back. Adapters reconstruct NumPy matrices (or
PyTorch-Geometric `Data` / Spektral `Graph` when those libraries exist) via
`toLocalIterator` — a streaming driver-side materialization, never a full
collect."""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession


def write_graph_frames(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy("game_id").parquet(path)


def read_graph_frames(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def iter_graph_tuples(df: DataFrame) -> Iterator[dict]:
    """Yield {a, x, e, graph_id, label, game_id, period_id, frame_id,
    object_ids, ball_owning_team_id} with NumPy matrices, streaming
    partition-by-partition. The locator keys (game_id/frame_id/object_ids/
    ball_owning_team_id) are what the graph-overlay renderer
    (sources/media.py:to_graph_png) joins back to the tracking frame on."""
    for row in df.toLocalIterator():
        yield {
            "a": np.asarray(row.a, dtype=float),
            "x": np.asarray(row.x, dtype=float),
            "e": np.asarray(row.e, dtype=float),
            "graph_id": row.graph_id,
            "label": row.label,
            "game_id": row.game_id,
            "period_id": row.period_id,
            "frame_id": row.frame_id,
            "object_ids": list(row.object_ids),
            "ball_owning_team_id": row.ball_owning_team_id,
        }


def to_pyg_data_iter(df: DataFrame):
    """PyTorch-Geometric adapter (edge_index from nonzero adjacency,
    default_graph_converter.py:175-248). Requires torch + torch_geometric."""
    try:
        import torch
        from torch_geometric.data import Data
    except ImportError as exc:  # pragma: no cover - torch absent here
        raise ImportError("torch_geometric required for to_pyg_data_iter") from exc
    for g in iter_graph_tuples(df):
        edge_index = torch.tensor(np.stack(np.nonzero(g["a"])), dtype=torch.long)
        yield Data(
            x=torch.tensor(g["x"], dtype=torch.float),
            edge_index=edge_index,
            edge_attr=torch.tensor(g["e"], dtype=torch.float),
            y=None if g["label"] is None else torch.tensor([g["label"]]),
        )


def to_spektral_graph_iter(df: DataFrame):
    """Spektral adapter. Requires spektral."""
    try:
        from spektral.data import Graph
    except ImportError as exc:  # pragma: no cover - spektral absent here
        raise ImportError("spektral required for to_spektral_graph_iter") from exc
    for g in iter_graph_tuples(df):
        yield Graph(x=g["x"], a=g["a"], e=g["e"], y=g["label"])


def graph_dimensions(df: DataFrame) -> tuple[int, int, int, int, int]:
    """(N, F, S, n_out, n) — max node count, node-feature dim, edge-feature
    dim, output dim, graph count (reference GraphDataset.dimensions(),
    graph_dataset.py; asserted in tests/test_soccer.py:924-929). One tiny
    aggregate over shape columns; the matrices are never touched."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.max("x_shape_0").alias("N"),
        F.max("x_shape_1").alias("F"),
        F.max("e_shape_1").alias("S"),
        F.count("*").alias("n"),
    ).head()
    return int(row.N), int(row.F), int(row.S), 1, int(row.n)
