"""American-football graph converter.

Re-expresses /root/reference/unravel/american_football/graphs/
graph_converter.py (validity filters :206-244, kernel :316-449) on the shared
Spark machinery: anti-join frame-validity filters (J4/A6), the soccer sort
expression (O2), and a batched Arrow grouped-map kernel over the fixed AF
feature stacks (functions/af_kernels.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.af_kernels import (
    FOOTBALL,
    compute_af_adjacency_matrix,
    compute_af_edge_features,
    compute_af_node_features,
)
from ..session import repartition_for_kernel
from ..settings import AmericanFootballGraphSettings
from .graph_converter import graph_frames_schema

BY_FRAME = ["game_id", "period_id", "frame_id"]


@dataclass
class AmericanFootballGraphConverter:
    dataset: DataFrame
    settings: AmericanFootballGraphSettings

    label_col: str = "label"
    graph_id_col: str = "graph_id"
    prediction: bool = False
    sample_rate: Optional[float] = None
    min_object_count: int = 10
    frames_per_batch: int = 2_000

    def __post_init__(self):
        if "period_id" not in self.dataset.columns:
            # BDB data is play-scoped; play_id plays the period role
            self.dataset = self.dataset.withColumn("period_id", F.col("play_id"))
        if self.graph_id_col not in self.dataset.columns:
            raise ValueError(f"dataset must contain {self.graph_id_col!r} (add_graph_ids)")
        if self.label_col not in self.dataset.columns:
            if not self.prediction:
                raise ValueError(f"dataset must contain {self.label_col!r} (or prediction=True)")
            self.dataset = self.dataset.withColumn(self.label_col, F.lit(None).cast("long"))

    def _valid_frames(self, df: DataFrame) -> DataFrame:
        """Drop frames with < min_object_count objects or no football row
        (reference :206-244, anti-joins)."""
        counts = df.groupBy(*BY_FRAME).agg(
            F.count("*").alias("size"),
            F.sum(F.when(F.col("team_id") == FOOTBALL, 1).otherwise(0)).alias("football_count"),
        )
        bad = counts.filter(
            (F.col("size") < self.min_object_count) | (F.col("football_count") == 0)
        ).select(*BY_FRAME)
        return df.join(bad, on=BY_FRAME, how="left_anti")

    def to_graph_frames(self) -> DataFrame:
        df = self.dataset
        if self.sample_rate is not None:
            df = df.filter(F.col("frame_id") % int(round(1.0 / self.sample_rate)) == 0)
        df = self._valid_frames(df)

        sort_key = (F.col("team_id") == FOOTBALL).cast("int") * 2 - (
            (F.col("ball_owning_team_id") == F.col("team_id")) & (F.col("team_id") != FOOTBALL)
        ).cast("int")

        settings = self.settings
        graph_id_col, label_col, prediction = self.graph_id_col, self.label_col, self.prediction
        schema = graph_frames_schema(label_col, graph_id_col)
        kernel_cols = [
            "game_id", "period_id", "frame_id", "x", "y", "v", "a", "o", "dir",
            "team_id", "position_name", "ball_owning_team_id", "height_cm",
            "weight_kg", "id", graph_id_col, label_col,
        ]
        array_cols = [c for c in kernel_cols if c not in ("game_id", "period_id", "frame_id")]

        def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["frame_id", "_sort_key", "id"], kind="stable")
            arrays = {c: pdf[c].to_numpy() for c in array_cols}
            frame_ids = pdf["frame_id"].to_numpy()
            bounds = np.flatnonzero(np.r_[True, frame_ids[1:] != frame_ids[:-1], True])
            meta = pdf[["game_id", "period_id", "frame_id"]]
            out = []
            for s, e in zip(bounds[:-1], bounds[1:]):
                d = {k: v[s:e] for k, v in arrays.items()}
                if not prediction and not np.all(d[label_col] == d[label_col][0]):
                    raise ValueError("label not constant within a frame group")
                adj = compute_af_adjacency_matrix(settings, d["team_id"])
                node = compute_af_node_features(d, settings)
                edge = compute_af_edge_features(adj, d, settings)
                m = meta.iloc[s]
                label_val = d[label_col][0]
                out.append(
                    {
                        "game_id": str(m["game_id"]),
                        "period_id": int(m["period_id"]),
                        "frame_id": int(frame_ids[s]),
                        "a": list(adj.astype(float)),
                        "e": list(edge),
                        "x": list(node),
                        "a_shape_0": adj.shape[0], "a_shape_1": adj.shape[1],
                        "e_shape_0": edge.shape[0], "e_shape_1": edge.shape[1],
                        "x_shape_0": node.shape[0], "x_shape_1": node.shape[1],
                        graph_id_col: str(d[graph_id_col][0]),
                        label_col: None if label_val is None or (isinstance(label_val, float) and np.isnan(label_val)) else int(label_val),
                        "object_ids": [str(v) for v in d["id"]],
                        "ball_owning_team_id": str(d["ball_owning_team_id"][0]),
                    }
                )
            return pd.DataFrame(out, columns=[f.name for f in schema.fields])

        chunk = (F.col("frame_id") / self.frames_per_batch).cast("long")
        keys = ["game_id", "period_id", "_chunk"]
        staged = (
            df.select(*kernel_cols)
            .withColumn("_sort_key", sort_key)
            .withColumn("_chunk", chunk)
        )
        return (
            repartition_for_kernel(staged, keys)
            .groupBy(*keys)
            .applyInPandas(run_batch, schema=schema)
        )
