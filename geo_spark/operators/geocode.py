"""Toponym resolution (text -> place): match document tokens against a
gazetteer of place names and disambiguate homonyms with a population
prior plus one spatial-coherence refinement.

This is the webtext->geo bridge of the pipeline ("page geotags parsed
from html/text joined to polygon layers"): the reference repo is the
spatial kernel under the join (s2/cellid.go, s2/region_coverer.go); a
geocoder is the composition a web-corpus user runs in front of it.
The disambiguation shape — population prior, then prefer the candidate
nearest the document's other resolved places — is the classic
two-heuristic toponym-resolution recipe.

Determinism contract (what makes an exact SQL oracle possible): the
gazetteer coordinate columns must be NON-NEGATIVE integers (e.g.
micro-degrees shifted by +90e6 / +180e6).  The anchor is an integer
floor-division mean (Spark ``div`` == DuckDB ``//`` on non-negative
operands only — the repo-wide integer-division rule) and the
refinement metric is the exact squared planar distance in those units,
so every comparison is BIGINT arithmetic, bit-equal across engines.

Scale shape (100 TB):
  * the token explode is the only corpus-wide reshuffle;
  * the gazetteer rides TWO broadcast joins (GeoNames is ~13M rows —
    dimension-sized by definition; swap to a plain equi-join if a
    deployment's gazetteer outgrows the broadcast threshold);
  * both pick stages are partial-aggregatable struct-extremum
    groupBys keyed by (doc, name) / (doc) — no windows, no corpus
    self-joins, skew bounded by mentions-per-document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def toponym_candidates(
    docs: DataFrame,
    gazetteer: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    name_col: str = "name",
) -> DataFrame:
    """(key, name, n_mentions): gazetteer-name mention counts per
    document.  Tokens = whitespace split; case normalization is the
    caller's job (match is exact)."""
    words = docs.select(
        F.col(key), F.explode(F.split(F.col(text_col), " +")).alias("name")
    ).where(F.length("name") > 0)
    names = gazetteer.select(F.col(name_col).alias("name")).distinct()
    return (
        words.join(F.broadcast(names), "name")
        .groupBy(key, "name")
        .agg(F.count("*").alias("n_mentions"))
    )


def toponym_resolve(
    docs: DataFrame,
    gazetteer: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    name_col: str = "name",
    geo_id_col: str = "geo_id",
    pop_col: str = "population",
    lat_col: str = "lat_u",
    lng_col: str = "lng_u",
    coherence: bool = True,
) -> DataFrame:
    """(key, name, n_mentions, geo_id, lat_u, lng_u): one resolved
    gazetteer entry per (document, mentioned name).

    Stage 1 — population prior: per (doc, name) the max-``pop_col``
    entry, ties to the smallest ``geo_id_col``.
    Stage 2 (``coherence=True``) — one Jacobi refinement: the document
    anchor is the integer floor-division mean of its stage-1 pick
    coordinates; each name then re-picks the entry minimizing the
    exact squared planar distance to that anchor, ties to max
    population then min geo_id.  One iteration is the standard
    fixed heuristic (a fixpoint loop is NOT run: it need not converge
    and would add a per-round shuffle).

    ``lat_col``/``lng_col`` must be non-negative integers (shifted
    micro-degrees) — see the module docstring.
    """
    cand = toponym_candidates(docs, gazetteer, key, text_col, name_col)
    gz = gazetteer.select(
        F.col(name_col).alias("name"),
        F.col(geo_id_col).cast("long").alias("_g"),
        F.col(pop_col).cast("long").alias("_p"),
        F.col(lat_col).cast("long").alias("_la"),
        F.col(lng_col).cast("long").alias("_lo"),
    )
    ent = cand.join(F.broadcast(gz), "name")
    s1 = ent.groupBy(key, "name", "n_mentions").agg(
        F.max(
            F.struct(
                F.col("_p").alias("p"),
                (-F.col("_g")).alias("ng"),
                F.col("_la").alias("la"),
                F.col("_lo").alias("lo"),
            )
        ).alias("_b")
    )
    if not coherence:
        return s1.select(
            key,
            "name",
            "n_mentions",
            (-F.col("_b.ng")).alias("geo_id"),
            F.col("_b.la").alias("lat_u"),
            F.col("_b.lo").alias("lng_u"),
        )
    anchor = (
        s1.groupBy(key)
        .agg(
            F.sum("_b.la").alias("_sla"),
            F.sum("_b.lo").alias("_slo"),
            F.count("*").alias("_k"),
        )
        .select(
            key,
            F.expr("_sla div _k").alias("_alat"),
            F.expr("_slo div _k").alias("_alng"),
        )
    )
    d2 = (F.col("_la") - F.col("_alat")) * (F.col("_la") - F.col("_alat")) + (
        F.col("_lo") - F.col("_alng")
    ) * (F.col("_lo") - F.col("_alng"))
    s2 = (
        ent.join(anchor, key)
        .withColumn("_d2", d2)
        .groupBy(key, "name", "n_mentions")
        .agg(
            F.min(
                F.struct(
                    F.col("_d2").alias("d"),
                    (-F.col("_p")).alias("np"),
                    F.col("_g").alias("g"),
                    F.col("_la").alias("la"),
                    F.col("_lo").alias("lo"),
                )
            ).alias("_b")
        )
    )
    return s2.select(
        key,
        "name",
        "n_mentions",
        F.col("_b.g").alias("geo_id"),
        F.col("_b.la").alias("lat_u"),
        F.col("_b.lo").alias("lng_u"),
    )


def toponym_spread(
    resolved: DataFrame,
    key: str = "doc_id",
    lat_col: str = "lat_u",
    lng_col: str = "lng_u",
) -> DataFrame:
    """(key, n_places, sse): the geographic dispersion of a document's
    resolved places — the exact integer sum of squared deviations of
    the pick coordinates from the document's floor-division mean
    (sse = 0 for a perfectly local document; continent-spanning news
    roundups score orders of magnitude higher).  The classic use is
    locality classification ('is this page ABOUT one place?') before
    tile attribution.

    Exactness: with m = sum div n (the same non-negative integer mean
    the resolver's anchor uses), sse expands to
    sum(x^2) - 2*m*sum(x) + n*m^2 per axis — ONE aggregation pass, no
    mean rejoin, every term BIGINT.  Only documents with >= 2 resolved
    places emit a row (a single place has no dispersion)."""
    la, lo = F.col(lat_col), F.col(lng_col)
    agg = resolved.groupBy(key).agg(
        F.count("*").alias("n_places"),
        F.sum(la).alias("_sa"),
        F.sum(la * la).alias("_sa2"),
        F.sum(lo).alias("_so"),
        F.sum(lo * lo).alias("_so2"),
    )
    ma = F.expr("_sa div n_places")
    mo = F.expr("_so div n_places")
    return agg.where(F.col("n_places") >= 2).select(
        key,
        "n_places",
        (
            F.col("_sa2")
            - 2 * ma * F.col("_sa")
            + F.col("n_places") * ma * ma
            + F.col("_so2")
            - 2 * mo * F.col("_so")
            + F.col("n_places") * mo * mo
        ).alias("sse"),
    )
