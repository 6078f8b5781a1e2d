"""Fan-out enrichment (SURVEY.md §2.2 P7/P11, §2.4).

The reference fetches child records per parent id and stamps the parent key
onto each child (``MarketoServiceImpl.java:136-153`` via the hand-rolled lazy
flatMap ``MarketoUtils.java:181-222``) — a nested-loop join executed against
the API. In Spark, fan-out IS a join: broadcast the (small) parent dimension
and let the child side stay partitioned; one stamp column per parent key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def stamp_constant(df: DataFrame, col: str, value) -> DataFrame:
    """Single-parent form: stamp the parent key on every child
    (``withColumn(listId, lit(id))``)."""
    return df.withColumn(col, F.lit(value))


def fanout_join(
    children: DataFrame,
    parents: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_parents: bool = True,
) -> DataFrame:
    """Many-parent form: children × parents on the fan-out key. Parents are
    the lists/programs dimension — tiny next to the child stream, so
    broadcast by default (no shuffle of the big side)."""
    p = broadcast(parents) if broadcast_parents else parents
    return children.join(p, on=on, how=how)
