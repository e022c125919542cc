"""GNN training smoke (VERDICT r1 next-round #4): an actual training run on
graph-converter output, CI-runnable without torch via the NumPy CGConv twin
(frozen backbone + trainable logistic head, exact manual gradients), plus the
torch-gated reference-shaped PyG path (skip-marked when torch is absent —
mirrors /root/reference/tests/test_torch.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from unravelsports_spark.datasets.synthetic import AWAY, HOME, synthetic_tracking_df
from unravelsports_spark.models.gnn import NumpyCrystalGNN, build_crystal_gnn, graph_loader
from unravelsports_spark.models.graph_converter import SoccerGraphConverter
from unravelsports_spark.schema import BALL, Column, Group
from unravelsports_spark.settings import GraphSettings


@pytest.fixture(scope="module")
def graph_frames(spark):
    tracking = synthetic_tracking_df(spark, n_frames=60, seed=11)
    # learnable target: which half of the pitch the ball is in
    ball_side = (
        tracking.filter(F.col(Column.TEAM_ID) == BALL)
        .select(*Group.BY_FRAME, (F.col(Column.X) > 0).cast("long").alias("_side"))
    )
    tracking = (
        tracking.join(ball_side, on=Group.BY_FRAME)
        .withColumn(Column.LABEL, F.col("_side"))
        .drop("_side")
    )
    settings = GraphSettings(home_team_id=HOME, away_team_id=AWAY)
    return SoccerGraphConverter(tracking, settings).to_graph_frames().cache()


def test_numpy_crystal_training_loss_decreases(graph_frames):
    first = graph_frames.head()
    n_node_feats = int(np.asarray(first.x).shape[1])
    n_edge_feats = int(np.asarray(first.e).shape[1])
    model = NumpyCrystalGNN(n_node_feats, n_edge_feats, channels=16, layers=3, seed=7)
    losses = model.fit(graph_loader(graph_frames, batch_size=16), epochs=8, lr=1.0)
    assert len(losses) == 8
    assert losses[-1] < losses[0] * 0.8, losses  # real learning, not noise
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:]))  # monotone GD


def test_numpy_crystal_learns_signal(graph_frames):
    """Ball-side labels are recoverable from node features → accuracy must
    beat chance by a wide margin after training."""
    first = graph_frames.head()
    model = NumpyCrystalGNN(
        int(np.asarray(first.x).shape[1]), int(np.asarray(first.e).shape[1]),
        channels=16, layers=2, seed=3,
    )
    model.fit(graph_loader(graph_frames, batch_size=32), epochs=40, lr=1.0)
    graphs = [g for b in graph_loader(graph_frames, batch_size=32) for g in b]
    X = np.asarray([model.pooled(g) for g in graphs])
    Xn = (X - model._mu) / model._sd
    y = np.asarray([g["label"] for g in graphs], dtype=float)
    acc = ((model.predict_proba(Xn) > 0.5) == y).mean()
    assert acc >= 0.9, acc


def test_edge_count_alignment_guard(graph_frames):
    g = next(iter(next(graph_loader(graph_frames, batch_size=1))))
    model = NumpyCrystalGNN(g["x"].shape[1], g["e"].shape[1], channels=4, layers=1)
    bad = dict(g, e=g["e"][:-1])
    with pytest.raises(ValueError, match="edge count mismatch"):
        model.pooled(bad)


def test_torch_crystal_gnn_two_epochs(graph_frames):
    """Reference-shaped PyG CGConv classifier, 2-epoch CPU run
    (mirrors /root/reference/tests/test_torch.py)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("torch_geometric")

    model = build_crystal_gnn(n_node_features=15, n_edge_features=6, channels=16, layers=2)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    bce = torch.nn.BCELoss()
    losses = []
    for _epoch in range(2):
        total, n = 0.0, 0
        for batch in graph_loader(graph_frames, batch_size=16):
            xs, eis, eas, bs, ys = [], [], [], [], []
            offset = 0
            for bi, g in enumerate(batch):
                src, dst = np.nonzero(g["a"])
                xs.append(torch.tensor(g["x"], dtype=torch.float32))
                eis.append(torch.tensor(np.stack([src, dst]) + offset, dtype=torch.long))
                eas.append(torch.tensor(g["e"], dtype=torch.float32))
                bs.append(torch.full((g["x"].shape[0],), bi, dtype=torch.long))
                ys.append(float(g["label"]))
                offset += g["x"].shape[0]
            opt.zero_grad()
            out = model(torch.cat(xs), torch.cat(eis, dim=1), torch.cat(eas),
                        torch.cat(bs)).squeeze(-1)
            loss = bce(out, torch.tensor(ys))
            loss.backward()
            opt.step()
            total, n = total + float(loss), n + 1
        losses.append(total / n)
    assert losses[-1] < losses[0]


def test_graph_loader_batching(graph_frames):
    n = graph_frames.count()
    sizes = [len(b) for b in graph_loader(graph_frames, batch_size=16)]
    assert sum(sizes) == n
    assert all(s <= 16 for s in sizes)


def test_graph_dimensions(graph_frames):
    """Reference GraphDataset.dimensions() twin (test_soccer.py:924-929
    asserts (N,F,S,n_out,n)); here against the synthetic corpus."""
    from unravelsports_spark.sources.graph_sink import graph_dimensions

    N, F_, S, n_out, n = graph_dimensions(graph_frames)
    assert (N, F_, S, n_out) == (23, 15, 6, 1)
    assert n == graph_frames.count()


def test_collate_disjoint_block_structure(graph_frames):
    from unravelsports_spark.models.gnn import (
        collate_disjoint,
        graph_loader,
        segment_mean_pool,
    )

    batch = next(graph_loader(graph_frames, batch_size=4))
    coll = collate_disjoint(batch)
    n_nodes = [len(g["x"]) for g in batch]
    assert coll["x"].shape[0] == sum(n_nodes)
    assert coll["batch"].tolist() == [i for i, n in enumerate(n_nodes) for _ in range(n)]
    assert coll["labels"].tolist() == [g["label"] for g in batch]
    # edges stay within their graph's node block (disjointness)
    import numpy as np

    offsets = np.cumsum([0] + n_nodes)
    src, dst = coll["edge_index"]
    for gi in range(len(batch)):
        m = (src >= offsets[gi]) & (src < offsets[gi + 1])
        assert ((dst[m] >= offsets[gi]) & (dst[m] < offsets[gi + 1])).all()
    assert coll["edge_index"].shape[1] == sum(int(np.asarray(g["a"]).sum()) for g in batch)

    # neighbor-sum over the disjoint edge_index == per-graph dense A^T @ x
    agg = np.zeros_like(coll["x"])
    np.add.at(agg, dst, coll["x"][src])
    for gi, g in enumerate(batch):
        a = np.asarray(g["a"], float)
        x = np.asarray(g["x"], float)
        np.testing.assert_allclose(
            agg[offsets[gi]:offsets[gi + 1]], a.T @ x, rtol=1e-12
        )

    # segment mean pool == per-graph mean
    pooled = segment_mean_pool(coll["x"], coll["batch"])
    for gi, g in enumerate(batch):
        np.testing.assert_allclose(pooled[gi], np.asarray(g["x"], float).mean(0), rtol=1e-12)
