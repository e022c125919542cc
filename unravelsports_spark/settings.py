"""Config objects carried beside the tracking table (no kloppy dependency).

Mirrors the reference's settings surface (/root/reference/unravel/utils/
objects/default_settings.py:33-64, unravel/soccer/graphs/graph_settings.py:
13-66, unravel/american_football/graphs/graph_settings.py) as plain
dataclasses. These are closed over in pandas-UDF kernels — Spark serializes
them into the UDF closure, the distributed equivalent of a broadcast of a
small config object.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class Dimension:
    min: float
    max: float


@dataclass
class PitchDimensions:
    """Metric soccer pitch, SecondSpectrum-style centered coordinates.

    Defaults match kloppy's MetricPitchDimensions (105m × 68m, centered), the
    coordinate frame the reference normalizes to (kloppy_polars.py:207-218).
    """

    x_dim: Dimension = field(default_factory=lambda: Dimension(-52.5, 52.5))
    y_dim: Dimension = field(default_factory=lambda: Dimension(-34.0, 34.0))
    standardized: bool = False

    @property
    def pitch_length(self) -> float:
        return self.x_dim.max - self.x_dim.min

    @property
    def pitch_width(self) -> float:
        return self.y_dim.max - self.y_dim.min


@dataclass
class AmericanFootballPitchDimensions:
    """120 × 53.3 yards; end zone starts 10 yd before x_max
    (default_settings.py:14-30)."""

    pitch_length: float = 120.0
    pitch_width: float = 53.3
    x_dim: Dimension = field(default_factory=lambda: Dimension(0.0, 120.0))
    y_dim: Dimension = field(default_factory=lambda: Dimension(0.0, 53.3))
    standardized: bool = False

    @property
    def end_zone(self) -> float:
        return self.x_dim.max - 10.0


@dataclass
class DefaultSettings:
    """Match-level config (default_settings.py:33-64)."""

    home_team_id: str | None = None
    away_team_id: str | None = None
    provider: str = "synthetic"
    pitch_dimensions: PitchDimensions = field(default_factory=PitchDimensions)
    orientation: str = "STATIC_HOME_AWAY"
    max_player_speed: float = 12.0
    max_ball_speed: float = 28.0
    max_player_acceleration: float = 6.0
    max_ball_acceleration: float = 13.5
    ball_carrier_threshold: float = 25.0
    frame_rate: int = 25


@dataclass
class GraphSettings(DefaultSettings):
    """Soccer graph-conversion settings with derived geometry
    (graph_settings.py:13-66)."""

    ball_id: str = "ball"
    goalkeeper_id: str = "GK"
    self_loop_ball: bool = False
    adjacency_matrix_type: str = "split_by_team"  # delaunay|split_by_team|dense|dense_ap|dense_dp
    adjacency_matrix_connect_type: str = "ball"  # ball|ball_carrier|no_connection
    defending_team_node_value: float = 0.1
    non_potential_receiver_node_value: float = 0.1

    def __post_init__(self):
        # reference clamps to [0, 1] (graph_settings.py:48-52); same for the
        # defending-team value which shares the 0..1 feature range
        self.non_potential_receiver_node_value = min(
            1.0, max(0.0, self.non_potential_receiver_node_value)
        )
        self.defending_team_node_value = min(1.0, max(0.0, self.defending_team_node_value))

    @property
    def max_distance(self) -> float:
        p = self.pitch_dimensions
        return math.sqrt(p.pitch_length**2 + p.pitch_width**2)

    @property
    def max_goal_distance(self) -> float:
        return self.max_distance

    @property
    def goal_mouth_position(self):
        p = self.pitch_dimensions
        return (p.x_dim.max, (p.y_dim.max + p.y_dim.min) / 2.0, 0.0)


@dataclass
class AmericanFootballGraphSettings(DefaultSettings):
    """AF variant (american_football/graphs/graph_settings.py:8-28)."""

    pitch_dimensions: AmericanFootballPitchDimensions = field(
        default_factory=AmericanFootballPitchDimensions
    )
    ball_id: str = "football"
    qb_id: str = "QB"
    attacking_non_qb_node_value: float = 0.1
    max_height: float = 225.0  # cm
    min_height: float = 150.0
    max_weight: float = 200.0  # kg
    min_weight: float = 60.0
    self_loop_ball: bool = False
    adjacency_matrix_type: str = "split_by_team"
    adjacency_matrix_connect_type: str = "ball"
    defending_team_node_value: float = 0.1
    max_player_speed: float = 12.0
    max_ball_speed: float = 28.0
    max_player_acceleration: float = 6.0
    max_ball_acceleration: float = 13.5

    @property
    def max_distance(self) -> float:
        p = self.pitch_dimensions
        return math.sqrt(p.pitch_length**2 + p.pitch_width**2)

    @property
    def goal_mouth_position(self):
        p = self.pitch_dimensions
        return (p.x_dim.max, (p.y_dim.max + p.y_dim.min) / 2.0, 0.0)


@dataclass
class Pad:
    """Padding targets (utils/features/utils.py:39-43)."""

    max_nodes: int = 23
    max_edges: int = 287
    n_players: int = 11
