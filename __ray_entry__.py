"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship pipeline (parse -> enrich -> metric aggregate)
  over the deterministic synthetic token table scaled to sf0.001.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 (+ the training-data operators); each callable takes
  ``sf_dir`` and returns a Dataset / pandas DataFrame / pyarrow Table.
- ``oracle_sql()``: DuckDB SQL per query. Two styles, documented in
  sbo_ray/pipelines/queries.py: genuinely independent SQL over the raw
  line view, or SELECTs over the materialized pure-Python oracle dumps
  (engine-vs-independent-implementation).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scaled synthetic token table."""
    from sbo_ray.pipelines.queries import q_log_metrics

    return q_log_metrics("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from sbo_ray.pipelines.queries import log_queries

    q = {}
    q.update(log_queries())
    try:
        from sbo_ray.pipelines.dataqueries import data_queries

        q.update(data_queries())
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from sbo_ray.pipelines.queries import log_oracle_sql

    sql = {}
    sql.update(log_oracle_sql())
    try:
        from sbo_ray.pipelines.dataqueries import data_oracle_sql

        sql.update(data_oracle_sql())
    except ImportError:
        pass
    return sql
