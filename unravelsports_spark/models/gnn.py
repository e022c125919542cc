"""GNN classifier surface (reference unravel/utils/objects/classifiers/
crystal_graph.py:6-44, crystal_graph_pyg.py:24-105: 3-layer CrystalConv /
CGConv, 128 channels, global mean pool, sigmoid head).

Training is out-of-engine (torch/spektral, absent here). The engine-side
contract this module keeps:

- `graph_loader`: batched iteration over a graph-frames DataFrame —
  `toLocalIterator` over repartitioned chunks, so the driver holds one batch
  at a time regardless of corpus size;
- `build_crystal_gnn`: constructs the reference-shaped PyG model when torch
  is importable (on a cluster you'd hand it to TorchDistributor with the
  loader feeding each worker's shard).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame


def graph_loader(graph_frames: DataFrame, batch_size: int = 64) -> Iterator[list[dict]]:
    """Yield lists of graph dicts (a, x, e, label) of ≤ batch_size."""
    batch: list[dict] = []
    for row in graph_frames.toLocalIterator():
        batch.append(
            {
                "a": np.asarray(row.a, dtype=float),
                "x": np.asarray(row.x, dtype=float),
                "e": np.asarray(row.e, dtype=float),
                "label": row.label,
            }
        )
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def build_crystal_gnn(n_node_features: int, n_edge_features: int, channels: int = 128, layers: int = 3):
    """Reference-shaped PyG model (CGConv ×3 → global mean pool → sigmoid)."""
    try:
        import torch
        from torch import nn
        from torch_geometric.nn import CGConv, global_mean_pool
    except ImportError as exc:
        raise ImportError(
            "torch + torch_geometric required to build the GNN; the Spark side "
            "(graph_loader batches) works without them"
        ) from exc

    class CrystalGNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(n_node_features, channels)
            self.convs = nn.ModuleList(
                [CGConv(channels, dim=n_edge_features) for _ in range(layers)]
            )
            self.head = nn.Sequential(nn.Linear(channels, 1), nn.Sigmoid())

        def forward(self, x, edge_index, edge_attr, batch):
            h = self.embed(x)
            for conv in self.convs:
                h = conv(h, edge_index, edge_attr)
            return self.head(global_mean_pool(h, batch))

    return CrystalGNN()
