"""REPLACE-INTO / delete-join semantics as DataFrame algebra.

The reference writes every target with ``REPLACE INTO`` (delete-then-insert
keyed on the PK, flat_obs_v1.0.sql:115 et al.) and retracts with delete-joins
(``delete t1 from flat_X t1 join Y t2 using(k)``, flat_obs_v1.0.sql:99-113).
On Spark the same semantics are:

* retraction  -> ``left_anti`` join of the target against the key set (J4-J6);
* upsert      -> anti-join the old target against the new rows' keys, then
                 union — equivalent to Delta ``MERGE WHEN MATCHED UPDATE
                 WHEN NOT MATCHED INSERT`` without requiring the Delta jars
                 (not in this image; the writer is format-agnostic so a Delta
                 path can slot in later).

At 100 TB the important property is that both shapes are plain shuffled
joins on the PK: they partition by key, broadcast automatically when the
delta side is small (AQE), and never collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def anti_delete(target: DataFrame, keys: DataFrame, on: Sequence[str]) -> DataFrame:
    """Remove target rows whose key appears in ``keys`` (J4).

    ``keys`` may carry extra columns; only ``on`` participates.
    """
    return target.join(keys.select(*on).distinct(), list(on), "left_anti")


def replace_into(
    target: DataFrame | None,
    new_rows: DataFrame,
    pk: Sequence[str],
    evolve_schema: bool = False,
    new_keys: DataFrame | None = None,
) -> DataFrame:
    """MySQL REPLACE INTO: new rows win over existing rows with the same PK.

    ``target=None`` models the cold-start (empty table) case.
    ``evolve_schema=True`` permits the delta to add (or omit) columns —
    the Delta-MERGE ``mergeSchema`` behavior: rows from the side missing
    a column carry NULL for it.  Off by default so an accidental schema
    drift in a fixed-schema pipeline still fails loudly.

    ``new_keys`` (r13, guide §2.4 "remove shuffles outright"): callers
    that already hold the delta's key set — the change-detection output
    that *produced* ``new_rows`` in the I1-I4 protocol — can pass it so
    the retraction anti-join builds against that small key table
    directly.  Without it the keys are re-derived from ``new_rows``,
    which re-executes the delta's whole plan (scan + semi-join +
    aggregate at 100 TB) a second time just to project its PK.  Caller
    contract (asserted by test_replace_into_with_precomputed_keys):
    ``new_keys[pk]`` must equal ``new_rows[pk]`` as a SET — REPLACE INTO
    then deletes exactly the same rows and the result is identical.
    """
    if target is None:
        return new_rows
    survivors = anti_delete(
        target, new_rows if new_keys is None else new_keys, pk
    )
    return survivors.unionByName(
        new_rows, allowMissingColumns=evolve_schema
    )


def dedupe_latest(
    df: DataFrame, pk: Sequence[str], order_col: str, desc: bool = True
) -> DataFrame:
    """Keep one row per PK, the latest by ``order_col`` — the parquet-only
    MERGE fallback (SURVEY §2.1 S4): ``row_number() over (partition by pk
    order by ord desc) = 1``.
    """
    ordering = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*pk).orderBy(ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
