"""Geometry utilities (K15) and stratified leakage-safe splits."""

import numpy as np
import pytest

from unravelsports_spark.datasets.synthetic import synthetic_tracking_df
from unravelsports_spark.datasets.tracking import split_by_graph_id_stratified
from unravelsports_spark.functions.geometry import (
    ray_line_intersections,
    rotate_around_line,
    rotate_vectors,
)


def test_ray_line_intersections():
    pos = np.array([[0.0, 0.0], [0.0, 0.0], [5.0, 5.0]])
    vel = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]])
    # vertical segment x=2 from y=-1 to 1
    hits = ray_line_intersections(pos, vel, np.array([2.0, -1.0]), np.array([2.0, 1.0]))
    np.testing.assert_allclose(hits[0], [2.0, 0.0])
    assert np.isnan(hits[1]).all()  # pointing away
    assert np.isnan(hits[2]).all()  # parallel miss


def test_rotate_vectors():
    v = np.array([[1.0, 0.0]])
    np.testing.assert_allclose(rotate_vectors(v, np.pi / 2), [[0.0, 1.0]], atol=1e-12)
    np.testing.assert_allclose(
        rotate_vectors(v, np.pi, origin=(1.0, 0.0)), [[1.0, 0.0]], atol=1e-12
    )


def test_rotate_around_line():
    pts = np.array([[0.0, 1.0], [3.0, -2.0]])
    # reflect across the x-axis
    out = rotate_around_line(pts, np.array([0.0, 0.0]), np.array([1.0, 0.0]))
    np.testing.assert_allclose(out, [[0.0, -1.0], [3.0, 2.0]], atol=1e-12)


def test_stratified_split_exact_ratios(spark):
    df = synthetic_tracking_df(spark, n_frames=100, seed=9)
    from unravelsports_spark.datasets.tracking import TrackingDataset

    ds = TrackingDataset(df)
    ds.add_dummy_labels().add_graph_ids()
    splits = split_by_graph_id_stratified(ds.data, train=0.6, test=0.2, val=0.2, seed=3)
    ids = {
        k: set(r.graph_id for r in v.select("graph_id").distinct().collect())
        for k, v in splits.items()
    }
    all_ids = ids["train"] | ids["test"] | ids["val"]
    assert len(all_ids) == 100
    assert not (ids["train"] & ids["test"]) and not (ids["test"] & ids["val"])
    # per-label fractions within one graph of exact
    for label in (0, 1):
        n_label = (
            ds.data.filter(f"label = {label}").select("graph_id").distinct().count()
        )
        n_train = (
            splits["train"].filter(f"label = {label}").select("graph_id").distinct().count()
        )
        assert abs(n_train - 0.6 * n_label) <= 1.5
