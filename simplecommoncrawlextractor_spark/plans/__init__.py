"""Plans: the URL frontier + fetch scheduler.

- ``state``     — snapshot-pinned state store (partitioned Parquet + atomic
  manifest; the Iceberg-equivalent commit protocol) and the partitioned
  bloom URL-seen filter with exact-hash confirmation and delete support.
- ``frontier``  — harvest → canonicalize → dedup → schedule pipeline stages.
- ``fetch``     — simulated ranged fetch + FETCH_STATUS classification +
  the 14-column fetch_log.
- ``scheduler`` — the iterative batch drain loop with checkpoint/resume and
  per-partition lineage metrics.
"""

from .state import BloomSeenSet, StateStore  # noqa: F401
from .frontier import (  # noqa: F401
    canonical_candidates,
    harvest_outlinks,
    politeness_schedule,
)
from .fetch import FETCH_STATUS, simulate_fetch  # noqa: F401
from .scheduler import CrawlScheduler  # noqa: F401
