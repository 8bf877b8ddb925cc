"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.
Never calls ``ray.init()``/``ray.shutdown()`` — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive transcripts,
    extract triples (tagged_as + structural edges) with the benchmark
    ontology; returns the triples Dataset."""
    from raykg.pipeline.queries import q_triples

    return q_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from raykg.pipeline.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raykg.pipeline.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
