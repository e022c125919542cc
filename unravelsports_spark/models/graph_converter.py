"""Soccer graph converter: canonical tracking table → per-frame GNN graph
tuples (adjacency, node features, edge features, label) on Spark.

Re-expresses /root/reference/unravel/soccer/graphs/graph_converter.py
(pipeline :165-238, padding :240-440, kernel :602-725) and
unravel/utils/objects/default_graph_converter.py:315-393 Spark-first:

- sample / incomplete-frame drop / padding are native DataFrame ops (modulo
  filter P5, semi-join J3, aggregate + sequence/explode row synthesis O12);
- the per-frame kernel is an Arrow grouped-map pandas UDF batched over
  (game_id, period_id, frame-chunk) groups — one shuffle total, frames looped
  inside the UDF so Arrow/serialization overhead is amortized; each frame's
  matrices are pure NumPy (functions/graph_features.py, golden-tested);
- output is a DataFrame of nested arrays + shape columns, written/read as
  parquet (the reference's gzip-pickle sink S4 ↔ our parquet graph sink).

Scale posture: groups are bounded by frames_per_batch so executor memory is
flat; everything before the single groupBy is embarrassingly parallel over
input splits, and the group key starts with game_id so a 100 TB / many-match
corpus spreads evenly across a large cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.graph_features import (
    DEFAULT_EDGE_FEATURES,
    DEFAULT_NODE_FEATURES,
    add_global_features,
    compute_adjacency_matrix,
    compute_edge_features,
    compute_node_features,
    frame_kwargs,
    verify_feature_funcs,
)
from ..functions.graph_features_batch import (
    BATCHABLE_ADJACENCY,
    batch_kwargs,
    compute_adjacency_batch,
    compute_edge_channels_batch,
    compute_node_features_batch,
)
from ..schema import BALL, Column, Group
from ..session import repartition_for_kernel
from ..settings import GraphSettings

MATRIX = T.ArrayType(T.ArrayType(T.DoubleType()))


def graph_frames_schema(label_col: str = "label", graph_id_col: str = "graph_id") -> T.StructType:
    """Struct-of-matrices output (default_graph_converter.py:315-334)."""
    return T.StructType(
        [
            T.StructField(Column.GAME_ID, T.StringType()),
            T.StructField(Column.PERIOD_ID, T.LongType()),
            T.StructField("frame_id", T.LongType()),
            T.StructField("a", MATRIX),
            T.StructField("e", MATRIX),
            T.StructField("x", MATRIX),
            T.StructField("a_shape_0", T.LongType()),
            T.StructField("a_shape_1", T.LongType()),
            T.StructField("e_shape_0", T.LongType()),
            T.StructField("e_shape_1", T.LongType()),
            T.StructField("x_shape_0", T.LongType()),
            T.StructField("x_shape_1", T.LongType()),
            T.StructField(graph_id_col, T.StringType()),
            T.StructField(label_col, T.LongType()),
            T.StructField("object_ids", T.ArrayType(T.StringType())),
            T.StructField("ball_owning_team_id", T.StringType()),
        ]
    )


@dataclass
class SoccerGraphConverter:
    dataset: DataFrame
    settings: GraphSettings = field(default_factory=GraphSettings)

    label_col: str = Column.LABEL
    graph_id_col: str = Column.GRAPH_ID
    prediction: bool = False
    pad: bool = False
    sample_rate: Optional[float] = None
    random_seed: bool | int = False

    node_feature_funcs: Optional[List[Callable]] = None
    edge_feature_funcs: Optional[List[Callable]] = None
    feature_opts: Optional[dict] = None
    global_feature_cols: List[str] = field(default_factory=list)
    global_feature_type: str = "ball"
    additional_feature_cols: List[str] = field(default_factory=list)

    frames_per_batch: int = 20_000

    def __post_init__(self):
        self.node_feature_funcs = (
            list(self.node_feature_funcs) if self.node_feature_funcs else list(DEFAULT_NODE_FEATURES)
        )
        self.edge_feature_funcs = (
            list(self.edge_feature_funcs) if self.edge_feature_funcs else list(DEFAULT_EDGE_FEATURES)
        )
        verify_feature_funcs(self.node_feature_funcs, "node")
        verify_feature_funcs(self.edge_feature_funcs, "edge")
        cols = self.dataset.columns
        if self.graph_id_col not in cols:
            raise ValueError(f"dataset must contain a {self.graph_id_col!r} column (add_graph_ids)")
        if self.label_col not in cols:
            if not self.prediction:
                raise ValueError(
                    f"dataset must contain a {self.label_col!r} column (or set prediction=True)"
                )
            self.dataset = self.dataset.withColumn(self.label_col, F.lit(None).cast("long"))
        if self.global_feature_type not in ("ball", "all"):
            raise ValueError("global_feature_type must be 'ball' or 'all'")

    # -- relational stages --------------------------------------------------

    def _sample(self, df: DataFrame) -> DataFrame:
        if self.sample_rate is None:
            return df
        return df.filter(F.col(Column.FRAME_ID) % int(round(1.0 / self.sample_rate)) == 0)

    def _remove_incomplete_frames(self, df: DataFrame) -> DataFrame:
        """J3: keep frames with exactly 3 distinct team ids (2 teams + ball),
        reference graph_converter.py:224-238."""
        valid = (
            df.groupBy(*Group.BY_FRAME)
            .agg(F.countDistinct(Column.TEAM_ID).alias("n_teams"))
            .filter(F.col("n_teams") == 3)
            .select(*Group.BY_FRAME)
        )
        return df.join(valid, on=Group.BY_FRAME, how="left_semi")

    def _apply_padding(self, df: DataFrame) -> DataFrame:
        """O12 re-expressed: per-(frame, team) deficit → sequence/explode row
        synthesis, plus anti-join ball-row synthesis; then a completeness
        filter (reference graph_converter.py:240-440). No driver-side loops —
        the whole stage is a handful of hash aggregations at scale."""
        keep = [Column.TIMESTAMP, Column.BALL_STATE, self.label_col, self.graph_id_col]
        group = [Column.GAME_ID, Column.PERIOD_ID, Column.FRAME_ID, Column.TEAM_ID,
                 Column.BALL_OWNING_TEAM_ID]
        empty_defaults = {
            Column.POSITION_NAME: F.lit(""),
            Column.OBJECT_ID: F.lit(""),
            Column.IS_BALL_CARRIER: F.lit(False),
            **{c: F.lit(0.0) for c in (
                Column.X, Column.Y, Column.Z, Column.VX, Column.VY, Column.VZ,
                Column.SPEED, Column.AX, Column.AY, Column.AZ, Column.ACCELERATION)},
        }
        schema = dict(df.dtypes)
        user_cols = [
            c for c in df.columns
            if c not in set(keep) | set(group) | set(empty_defaults) | set(self.global_feature_cols)
        ]

        firsts = [F.first(c).alias(c) for c in keep + self.global_feature_cols]
        counts = df.groupBy(*group).agg(F.count("*").alias("cnt"), *firsts)
        target = F.when(F.col(Column.TEAM_ID) == BALL, 1).otherwise(11)
        deficits = counts.withColumn("repeats", target - F.col("cnt")).filter(F.col("repeats") > 0)
        player_pad = deficits.withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("repeats")))).drop(
            "cnt", "repeats", "_i"
        )

        frame_cols = [Column.GAME_ID, Column.PERIOD_ID, Column.FRAME_ID]
        all_frames = df.select(
            *frame_cols, Column.BALL_OWNING_TEAM_ID, *keep, *self.global_feature_cols
        ).dropDuplicates(frame_cols)
        with_ball = df.filter(F.col(Column.TEAM_ID) == BALL).select(*frame_cols).distinct()
        ball_pad = (
            all_frames.join(with_ball, on=frame_cols, how="left_anti")
            .withColumn(Column.TEAM_ID, F.lit(BALL))
        )

        pad = player_pad.unionByName(ball_pad, allowMissingColumns=True)
        for c, default in empty_defaults.items():
            pad = pad.withColumn(c, default.cast(schema[c]))
        for c in user_cols:
            pad = pad.withColumn(c, F.lit(None).cast(schema[c]))
        pad = pad.select(*df.columns)

        result = df.unionByName(pad)

        is_ball = (F.col(Column.TEAM_ID) == BALL).cast("int")
        is_owning = (F.col(Column.TEAM_ID) == F.col(Column.BALL_OWNING_TEAM_ID)).cast("int")
        complete = (
            result.groupBy(*Group.BY_FRAME)
            .agg(
                F.sum(is_ball).alias("n_ball"),
                F.sum(is_owning).alias("n_own"),
                F.sum(1 - is_ball - is_owning).alias("n_other"),
            )
            .filter((F.col("n_ball") == 1) & (F.col("n_own") == 11) & (F.col("n_other") == 11))
            .select(*Group.BY_FRAME)
        )
        return result.join(complete, on=Group.BY_FRAME, how="left_semi")

    # -- kernel stage -------------------------------------------------------

    def to_graph_frames(self) -> DataFrame:
        df = self._sample(self.dataset)
        # pad=False drops incomplete frames INSIDE the kernel (a per-group
        # check that costs nothing) instead of the J3 semi-join pre-stage —
        # two fewer shuffles; identical semantics (the relational form
        # remains available as _remove_incomplete_frames / the j3_semi_join
        # query). pad=True needs the relational padding stage.
        drop_incomplete = not self.pad
        if self.pad:
            df = self._apply_padding(df)

        # O2 node ordering: owning team first, then defenders, ball last
        sort_key = (F.col(Column.TEAM_ID) == BALL).cast("int") * 2 - (
            (F.col(Column.BALL_OWNING_TEAM_ID) == F.col(Column.TEAM_ID))
            & (F.col(Column.TEAM_ID) != BALL)
        ).cast("int")

        kernel_cols = [
            Column.GAME_ID, Column.PERIOD_ID, Column.FRAME_ID,
            Column.X, Column.Y, Column.Z, Column.SPEED, Column.VX, Column.VY, Column.VZ,
            Column.ACCELERATION, Column.AX, Column.AY, Column.AZ,
            Column.TEAM_ID, Column.POSITION_NAME, Column.BALL_OWNING_TEAM_ID,
            Column.IS_BALL_CARRIER, Column.OBJECT_ID,
            self.graph_id_col, self.label_col,
            *self.global_feature_cols, *self.additional_feature_cols,
        ]
        schema = graph_frames_schema(self.label_col, self.graph_id_col)

        settings = self.settings
        node_funcs, edge_funcs = self.node_feature_funcs, self.edge_feature_funcs
        opts = self.feature_opts
        global_cols, global_type = self.global_feature_cols, self.global_feature_type
        extra_cols = self.additional_feature_cols
        graph_id_col, label_col, prediction = self.graph_id_col, self.label_col, self.prediction
        random_seed = self.random_seed

        array_cols = [
            "x", "y", "z", "v", "vx", "vy", "vz", "a", "ax", "ay", "az",
            "team_id", "position_name", "ball_owning_team_id", "is_ball_carrier", "id",
            graph_id_col, label_col, *global_cols, *extra_cols,
        ]

        # Batched fast path: default features + dense adjacency → vectorize
        # over same-size frames (graph_features_batch.py; several-fold less
        # per-frame CPU). Custom plugins / feature opts / delaunay keep the
        # per-frame plugin contract.
        use_batch = (
            node_funcs == list(DEFAULT_NODE_FEATURES)
            and edge_funcs == list(DEFAULT_EDGE_FEATURES)
            and not opts
            and settings.adjacency_matrix_type in BATCHABLE_ADJACENCY
        )

        def compute_batched(frames: list[dict]) -> list[tuple]:
            by_n: dict[int, list[int]] = {}
            for i, d in enumerate(frames):
                by_n.setdefault(len(d["team_id"]), []).append(i)
            results: list[tuple] = [None] * len(frames)
            stack_keys = [
                "x", "y", "z", "v", "vx", "vy", "vz",
                "team_id", "position_name", "ball_owning_team_id", "is_ball_carrier",
            ]
            for idxs in by_n.values():
                stacked = {
                    k: np.stack([frames[i][k] for i in idxs]) for k in stack_keys
                }
                bk = batch_kwargs(stacked, settings)
                adj_b = compute_adjacency_batch(bk, settings)
                node_b = compute_node_features_batch(bk, settings)
                edge_b = compute_edge_channels_batch(bk, settings)
                for j, i in enumerate(idxs):
                    adj = adj_b[j]
                    nz = np.where(adj == 1)
                    results[i] = (adj, np.nan_to_num(edge_b[j][nz]), node_b[j])
            return results

        def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(
                by=[Column.FRAME_ID, "_sort_key", Column.OBJECT_ID],
                kind="stable",
            )
            arrays = {c: pdf[c].to_numpy() for c in array_cols}
            frame_ids = pdf[Column.FRAME_ID].to_numpy()
            bounds = np.flatnonzero(np.r_[True, frame_ids[1:] != frame_ids[:-1], True])
            meta = pdf[[Column.GAME_ID, Column.PERIOD_ID, Column.FRAME_ID]]

            frames, starts = [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                d = {k: v[s:e] for k, v in arrays.items()}
                if drop_incomplete and len(np.unique(d["team_id"])) != 3:
                    continue
                if random_seed is not False and random_seed is not None:
                    n = e - s
                    seed = None if random_seed is True else int(random_seed) + int(frame_ids[s])
                    perm = np.random.default_rng(seed).permutation(n)
                    d = {k: v[perm] for k, v in d.items()}
                if not np.all(d[graph_id_col] == d[graph_id_col][0]):
                    raise ValueError("graph_id not constant within a frame group")
                if not prediction and not np.all(d[label_col] == d[label_col][0]):
                    raise ValueError("label not constant within a frame group")
                frames.append(d)
                starts.append(s)

            if use_batch:
                results = compute_batched(frames)
            else:
                results = []
                for d in frames:
                    fk = frame_kwargs(d, settings)
                    adj = compute_adjacency_matrix(settings, **fk)
                    edge, _ = compute_edge_features(adj, edge_funcs, opts, settings, **fk)
                    node, _ = compute_node_features(node_funcs, opts, settings, **fk)
                    results.append((adj, edge, node))

            out = []
            for s, d, (adj, edge, node) in zip(starts, frames, results):
                if global_cols:
                    bad = [c for c in global_cols if not np.all(d[c] == d[c][0])]
                    if bad:
                        raise ValueError(f"global feature cols not constant per frame: {bad}")
                    gvals = np.asarray([d[c][0] for c in global_cols], dtype=float)
                    ball_rows = np.where(d["team_id"] == settings.ball_id)[0]
                    ball_idx = ball_rows if len(ball_rows) else 0
                    node = add_global_features(node, gvals, global_type, ball_idx)
                m = meta.iloc[s]
                label_val = d[label_col][0]
                out.append(
                    {
                        Column.GAME_ID: m[Column.GAME_ID],
                        Column.PERIOD_ID: m[Column.PERIOD_ID],
                        "frame_id": int(m[Column.FRAME_ID]),
                        # list-of-rows (ndarray) cells: Arrow consumes these
                        # without a per-element Python round-trip
                        "a": list(adj.astype(float)),
                        "e": list(edge),
                        "x": list(node),
                        "a_shape_0": adj.shape[0],
                        "a_shape_1": adj.shape[1],
                        "e_shape_0": edge.shape[0],
                        "e_shape_1": edge.shape[1],
                        "x_shape_0": node.shape[0],
                        "x_shape_1": node.shape[1],
                        graph_id_col: str(d[graph_id_col][0]),
                        label_col: None if label_val is None or (isinstance(label_val, float) and np.isnan(label_val)) else int(label_val),
                        "object_ids": list(d["id"]),
                        "ball_owning_team_id": d["ball_owning_team_id"][0],
                    }
                )
            return pd.DataFrame(out, columns=[f.name for f in schema.fields])

        chunk = (F.col(Column.FRAME_ID) / self.frames_per_batch).cast("long")
        keys = [Column.GAME_ID, Column.PERIOD_ID, "_chunk"]
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
