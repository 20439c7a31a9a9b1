"""Register the engine surface for ``spark.sql`` string users.

The reference is consumed as a library; its relational shell's users
live in SQL.  Two tiers:

- **Native SQL UDFs** (``CREATE OR REPLACE TEMPORARY FUNCTION ...
  RETURN <expr>``, Spark 4): the cell-id bit-math family.  Spark
  inlines the RETURN expression into the caller's plan, so these stay
  inside whole-stage codegen exactly like the Column builders in
  :mod:`geo_spark.functions.sql` they mirror (verified by the
  plan-shape test: the physical plan shows folded bit masks, no UDF
  call).
- **Arrow (pandas) UDFs**: the kernels that genuinely need Python
  (full Hilbert encode/decode, tokens, hex tiling), registered under
  stable SQL names via ``spark.udf.register``.

All ids are the engine's biased-signed int64 representation
(``geo_spark.kernel.cellid.to_signed``); see functions/sql.py for why
uint64 semantics survive the bias.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# mirrors of geo_spark.functions.sql (s2/cellid.go:150-481 bit math);
# `lsb` inlines as (cid & -cid) everywhere
_NATIVE_FNS = [
    (
        "s2_lsb(cid BIGINT) RETURNS BIGINT",
        "cid & -cid",
    ),
    (
        "s2_level(cid BIGINT) RETURNS INT",
        "30 - CAST(shiftright(bit_count((cid & -cid) - 1), 1) AS INT)",
    ),
    (
        "s2_parent(cid BIGINT, lvl INT) RETURNS BIGINT",
        "(cid & -shiftleft(CAST(1 AS BIGINT), 2*(30 - lvl)))"
        " | shiftleft(CAST(1 AS BIGINT), 2*(30 - lvl))",
    ),
    (
        "s2_range_min(cid BIGINT) RETURNS BIGINT",
        "cid - ((cid & -cid) - 1)",
    ),
    (
        "s2_range_max(cid BIGINT) RETURNS BIGINT",
        "cid + ((cid & -cid) - 1)",
    ),
    (
        "s2_contains(a BIGINT, b BIGINT) RETURNS BOOLEAN",
        "a - ((a & -a) - 1) <= b AND b <= a + ((a & -a) - 1)",
    ),
    (
        "s2_is_leaf(cid BIGINT) RETURNS BOOLEAN",
        "(cid & 1) = 1",
    ),
    (
        "s2_face(cid BIGINT) RETURNS INT",
        "CAST(shiftrightunsigned(cid ^ CAST(-9223372036854775808 AS BIGINT), 61)"
        " AS INT)",
    ),
    (
        "s2_child_begin(cid BIGINT, lvl INT) RETURNS BIGINT",
        "cid - (cid & -cid) + shiftleft(CAST(1 AS BIGINT), 2*(30 - lvl))",
    ),
    (
        "s2_child_end(cid BIGINT, lvl INT) RETURNS BIGINT",
        "cid + (cid & -cid) + shiftleft(CAST(1 AS BIGINT), 2*(30 - lvl))",
    ),
    (
        "s2_next(cid BIGINT) RETURNS BIGINT",
        "cid + shiftleft(cid & -cid, 1)",
    ),
    (
        "s2_prev(cid BIGINT) RETURNS BIGINT",
        "cid - shiftleft(cid & -cid, 1)",
    ),
    (
        "s2_advance(cid BIGINT, steps BIGINT) RETURNS BIGINT",
        "cid + steps * shiftleft(cid & -cid, 1)",
    ),
]


def register_sql(spark: SparkSession, hex_res: int = 3) -> None:
    """Idempotently register the engine's SQL surface."""
    for sig, body in _NATIVE_FNS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {sig} RETURN {body}")

    from geo_spark.functions import s2 as fs2
    from geo_spark.functions.hex import hex_cell_udf, hex_center_udf

    for name, fn in [
        ("s2_cellid", fs2.s2_cellid),
        ("s2_cell_lat", fs2.s2_cell_lat),
        ("s2_cell_lng", fs2.s2_cell_lng),
        ("s2_token", fs2.s2_token),
        ("s2_from_token", fs2.s2_from_token),
        ("s2_face_ij", fs2.s2_face_ij),
        ("s2_cellid_from_face_ij", fs2.s2_cellid_from_face_ij),
        ("s2_edge_neighbors", fs2.s2_edge_neighbors),
        ("s2_xyz", fs2.s2_xyz),
        (f"hex_cell_r{hex_res}", hex_cell_udf(hex_res)),
        ("hex_center", hex_center_udf),
    ]:
        spark.udf.register(name, fn)
