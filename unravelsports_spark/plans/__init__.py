"""Query plans: the SURVEY §2 operator inventory expressed as native Spark
DataFrame plans over the synthetic star schema, each with a DuckDB oracle."""

from .relational import QUERIES, ORACLE_SQL  # noqa: F401
from . import pipeline  # noqa: F401  (registers pipeline queries)
from . import models_plans  # noqa: F401  (registers model rows-only queries)
from . import corpus2  # noqa: F401  (registers round-2 corpus queries)
from . import relational2  # noqa: F401  (registers round-2 relational queries)
from . import corpus3  # noqa: F401  (registers round-3 retrieval/pagerank queries)
from . import model_twins  # noqa: F401  (registers hash-certifiable model-kernel twins)
from . import snapshots  # noqa: F401  (snapshot oracles for deterministic estimator queries)
from . import corpus4  # noqa: F401  (registers round-4 data-selection/sharding queries)
from . import corpus5  # noqa: F401  (registers round-9 mining/spectral/unigram queries)
from . import corpus6  # noqa: F401  (registers round-10 wordpiece/mfcc/sampling/privacy/index queries)
from . import corpus7  # noqa: F401  (registers round-11 privacy/splits/embstats/jsonl/video/audio queries)
from . import corpus8  # noqa: F401  (registers round-12 boilerplate/hamming-neardup/html-extract queries)
from . import corpus9  # noqa: F401  (registers round-13 csv/warc boundary, t-closeness, release-diff queries)
from . import corpus10  # noqa: F401  (registers round-14 crawl triad + tfrecord boundary queries)
