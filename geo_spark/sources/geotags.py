"""Geotag extraction from page html/text — native Spark SQL only.

Parses ``<meta name="geo.position" content="lat;lng">`` and
``<meta name="ICBM" content="lat, lng">`` tags (the public geotagging
conventions) with ``regexp_extract`` so extraction stays inside whole-stage
codegen; no reference analog (the reference has no I/O layer).

The ``text`` column is passed through untouched — byte-identical text per url
is the engine's per-row invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One capture group per tag: grab the whole content attribute in a single
# regex pass, then split — regexp_extract is the expensive operator here, so
# each pattern must run at most once per row.
GEO_POSITION_RE = r'<meta\s+name="geo\.position"\s+content="(-?\d+(?:\.\d+)?\s*;\s*-?\d+(?:\.\d+)?)"'
ICBM_RE = r'<meta\s+name="ICBM"\s+content="(-?\d+(?:\.\d+)?\s*,\s*-?\d+(?:\.\d+)?)"'


def _html_str(html: Column) -> Column:
    return F.decode(html, "UTF-8")


def with_geotags(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Adds ``lat``/``lng`` doubles parsed from the html column.

    geo.position takes precedence; ICBM is the fallback (its regex is only
    evaluated for rows where geo.position missed — CASE WHEN is lazy inside
    codegen).  Rows with no tag or out-of-range coordinates get null lat/lng
    (they survive with null tiles — filtering is the caller's choice, so
    counts stay lineage-auditable).
    """
    h = _html_str(F.col(html_col))
    gp = F.nullif(F.regexp_extract(h, GEO_POSITION_RE, 1), F.lit(""))
    pair = F.coalesce(
        F.split(gp, ";"),
        F.split(F.nullif(F.regexp_extract(h, ICBM_RE, 1), F.lit("")), ","),
    )

    # Plan-shape discipline: the regex must execute exactly once per row.
    # Two traps guarded here: (a) referencing lat AND lng from the same
    # expression tree would let CollapseProject duplicate the regex into
    # every consumer (including interpreted Python-UDF argument projections,
    # which have no runtime subexpression elimination); (b) range validation
    # references its own operand twice.  Binding ``pair`` as a higher-order-
    # function lambda variable makes it evaluate once, and exposing the
    # result as a struct referenced twice blocks projection collapse.
    def _mk(p: Column) -> Column:
        la = F.trim(F.element_at(p, 1)).cast("double")
        ln = F.trim(F.element_at(p, 2)).cast("double")
        return F.struct(
            F.when((la >= -90) & (la <= 90), la).alias("lat"),
            F.when((ln >= -180) & (ln <= 180), ln).alias("lng"),
        )

    geo = F.element_at(F.transform(F.array(pair), _mk), 1)
    return (
        pages.withColumn("_geo", geo)
        .withColumns({"lat": F.col("_geo.lat"), "lng": F.col("_geo.lng")})
        .drop("_geo")
    )
