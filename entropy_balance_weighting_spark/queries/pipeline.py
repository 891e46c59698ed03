"""LLM-data-pipeline queries (extension surface) — compatibility shim.

The former monolithic module (2,600+ lines, 61 queries) is split by
family (round-7 verdict item #6): :mod:`pipeline_dedup`,
:mod:`pipeline_text`, :mod:`pipeline_events`, :mod:`pipeline_sim`,
:mod:`pipeline_sampling`, :mod:`pipeline_dq`, :mod:`pipeline_mm`,
:mod:`pipeline_text_stats`.
Registration names are unchanged; importing this module (as
``queries/__init__`` does) still registers every query, and existing
``queries.pipeline.<fn>`` references keep resolving via the star
re-exports below.
"""

from __future__ import annotations

from entropy_balance_weighting_spark.queries.pipeline_dedup import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_dq import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_events import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_mm import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_sampling import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_sim import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_text import *  # noqa: F401,F403
from entropy_balance_weighting_spark.queries.pipeline_text_stats import *  # noqa: F401,F403
