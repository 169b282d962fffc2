"""Engine configuration — semantics of the reference's ``notebooks/_config.py``.

Reference parity notes (file:line cite into /root/reference):
- three hex resolutions market/trade-area/site, edge ~1.2km/460m/174m
  (`notebooks/_config.py:43-45`)
- five demo metros (`notebooks/_config.py:49-55`)
- Huff gravity parameters: beta grid [1.0, 3.0] step 0.25, default 2.0
  (`notebooks/_config.py:66-67`)
- trade-area radius 3.0 miles (`notebooks/10_feature_engineering.py:269`)

No Databricks widgets: plain constants + env overrides.
"""

from __future__ import annotations

import os

# ---------------------------------------------------------------------------
# Hex grid resolutions. Our from-scratch lattice is an axial (pointy-top)
# hex grid in lon/lat degree space. ``size`` is the center-to-vertex radius
# in degrees, chosen so edge lengths approximate the reference's H3
# resolutions 7/8/9 (~1.2 km / 460 m / 174 m at mid latitudes).
# ---------------------------------------------------------------------------
RES_MARKET = 7
RES_TRADE_AREA = 8  # primary analysis resolution (reference default)
RES_SITE = 9

HEX_SIZE_DEG: dict[int, float] = {
    7: 0.012,
    8: 0.0045,
    9: 0.0017,
}

# Packed 64-bit cell id layout (fits in float64's exact-integer range 2^53,
# so the id survives any engine that routes integers through doubles):
#   cell_id = (res - 6) * 2^50 + (q + 2^24) * 2^25 + (r + 2^24)
RES_CODE_SHIFT = 1_125_899_906_842_624  # 2^50
AXIS_SHIFT = 33_554_432  # 2^25
AXIS_OFFSET = 16_777_216  # 2^24

# ---------------------------------------------------------------------------
# Metros (reference `notebooks/_config.py:49-55`): name, center lat, lon.
# ---------------------------------------------------------------------------
METROS: list[tuple[str, float, float]] = [
    ("Chicago", 41.88, -87.63),
    ("Dallas", 32.78, -96.80),
    ("Atlanta", 33.75, -84.39),
    ("Phoenix", 33.45, -112.07),
    ("Seattle", 47.61, -122.33),
]
METRO_JITTER_DEG = 0.5  # bbox half-size 0.25 deg, as reference 0.5x0.5 boxes

# ---------------------------------------------------------------------------
# Feature-engineering parameters (reference `notebooks/10_feature_engineering.py`)
# ---------------------------------------------------------------------------
TRADE_AREA_RADIUS_MILES = 3.0  # `:269,399,651-653`
DISTANCE_FLOOR_MILES = 0.05  # `:630,650` — F.greatest(dist, 0.05)
GRAVITY_EPS = 0.01  # `:270` — 1/(d^2 + 0.01)

HUFF_BETA_GRID = [1.0 + 0.25 * i for i in range(9)]  # 1.0 .. 3.0 step .25
HUFF_BETA_DEFAULT = 2.0

# Tier thresholds on percentile rank (`notebooks/13_score_candidates.py:171-181`)
TIER_THRESHOLDS = [("A", 0.90), ("B", 0.70), ("C", 0.40)]  # else "D"

# Model quality gates (`notebooks/_config.py:156-158`)
MODEL_R2_GATE = 0.35
MODEL_MAPE_GATE = 0.30

# ---------------------------------------------------------------------------
# Runtime
# ---------------------------------------------------------------------------
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
