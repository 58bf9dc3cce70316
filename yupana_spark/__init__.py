"""yupana_spark — a PySpark-native OLAP engine with the query and
data-processing capabilities of rusexpertiza-llc/yupana (reference at
/root/reference, surveyed in SURVEY.md).

Layers:

- ``types`` / ``expressions`` / ``query``: typed IR (≙ yupana-api)
- ``sql``: YupanaQL parser + analyzer (≙ yupana-core sql/)
- ``compiler``: IR -> DataFrame (replaces the JIT pipeline; Catalyst does the
  physical work)
- ``schema`` / ``catalog``: table registry + the driver-testdata schema
- ``functions``: tokens/stemmer UDF and friends
- ``operators``: writes (upsert/rollup/changelog), admin surface
- ``streaming``: Structured Streaming ingestion
- ``datapipe``: LLM-data-pipeline operators (dedup, similarity search,
  multimodal plumbing, text analysis) — beyond the reference's surface
"""

from . import expressions as E  # noqa: F401
from .catalog import default_schema  # noqa: F401
from .compiler import Tsdb  # noqa: F401
from .query import Query, QueryField, query  # noqa: F401
from .schema import Dimension, ExternalLink, LinkField, Metric, Schema, Table  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
