"""Toponym resolution tests: population prior, spatial-coherence
flip, tie determinism, and stage equivalences."""

from pyspark.sql import functions as F

from geo_spark.operators.geocode import toponym_candidates, toponym_resolve


def _u(lat_deg: float, lng_deg: float) -> tuple[int, int]:
    """Shifted micro-degree ints (non-negative, the operator contract)."""
    return int((lat_deg + 90.0) * 1e6), int((lng_deg + 180.0) * 1e6)


def _gazetteer(spark):
    rows = []
    # 'paris': France (huge pop, Europe) vs Texas (small, US)
    rows.append(("paris", 1, 2_100_000, *_u(48.85, 2.35)))
    rows.append(("paris", 2, 25_000, *_u(33.66, -95.55)))
    # 'springfield': Illinois (bigger) vs Massachusetts
    rows.append(("springfield", 3, 114_000, *_u(39.78, -89.65)))
    rows.append(("springfield", 4, 155_000, *_u(42.10, -72.59)))
    # 'dallas': unambiguous US anchor
    rows.append(("dallas", 5, 1_300_000, *_u(32.78, -96.80)))
    # 'lyon': unambiguous France anchor
    rows.append(("lyon", 6, 520_000, *_u(45.76, 4.84)))
    # 'tietown': exact population tie -> min geo_id
    rows.append(("tietown", 7, 500, *_u(10.0, 10.0)))
    rows.append(("tietown", 8, 500, *_u(-10.0, -10.0)))
    return spark.createDataFrame(
        rows, "name string, geo_id long, population long, lat_u long, lng_u long"
    )


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_candidates_counts_and_misses(spark):
    docs = _docs(spark, ["paris and paris near dallas", "nowhere words only"])
    got = {
        (r["doc_id"], r["name"]): r["n_mentions"]
        for r in toponym_candidates(docs, _gazetteer(spark)).collect()
    }
    assert got == {(0, "paris"): 2, (0, "dallas"): 1}


def test_population_prior_without_coherence(spark):
    docs = _docs(spark, ["paris springfield"])
    got = {
        r["name"]: r["geo_id"]
        for r in toponym_resolve(
            docs, _gazetteer(spark), coherence=False
        ).collect()
    }
    # max population everywhere: paris->France(1), springfield->MA(4)
    assert got == {"paris": 1, "springfield": 4}


def test_coherence_flips_paris_next_to_dallas(spark):
    """'paris ... dallas' is Paris, Texas: the US anchor pulls the
    re-pick away from the population prior."""
    docs = _docs(spark, ["paris dallas", "paris lyon"])
    got = {
        (r["doc_id"], r["name"]): r["geo_id"]
        for r in toponym_resolve(docs, _gazetteer(spark)).collect()
    }
    assert got[(0, "paris")] == 2  # Texas, near Dallas
    assert got[(1, "paris")] == 1  # France, near Lyon
    assert got[(0, "dallas")] == 5 and got[(1, "lyon")] == 6


def test_population_tie_takes_min_geo_id(spark):
    docs = _docs(spark, ["tietown"])
    got = toponym_resolve(docs, _gazetteer(spark), coherence=False).collect()
    assert [(r["name"], r["geo_id"]) for r in got] == [("tietown", 7)]


def test_single_name_doc_coherence_is_stable(spark):
    """With one mentioned name the anchor IS the stage-1 pick, so
    stage 2 must return it unchanged (d2 = 0 beats everything)."""
    docs = _docs(spark, ["springfield springfield"])
    s1 = toponym_resolve(docs, _gazetteer(spark), coherence=False).collect()
    s2 = toponym_resolve(docs, _gazetteer(spark), coherence=True).collect()
    assert [(r["name"], r["geo_id"], r["n_mentions"]) for r in s1] == [
        (r["name"], r["geo_id"], r["n_mentions"]) for r in s2
    ]
    assert s1[0]["geo_id"] == 4


def test_resolve_coordinates_ride_the_pick(spark):
    docs = _docs(spark, ["paris lyon"])
    got = {r["name"]: (r["lat_u"], r["lng_u"]) for r in
           toponym_resolve(docs, _gazetteer(spark)).collect()}
    assert got["paris"] == _u(48.85, 2.35)
    assert got["lyon"] == _u(45.76, 4.84)


def test_toponym_spread_hand_values(spark):
    from geo_spark.operators.geocode import toponym_spread

    rows = [
        (1, "a", 100, 200),
        (1, "b", 104, 210),
        (1, "c", 96, 190),
        (2, "d", 7, 9),  # single place: no row
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, name string, lat_u long, lng_u long"
    )
    got = {r["doc_id"]: (r["n_places"], r["sse"]) for r in
           toponym_spread(df).collect()}
    # doc 1: mean lat = 300 div 3 = 100, mean lng = 600 div 3 = 200
    sse = (0 + 16 + 16) + (0 + 100 + 100)
    assert got == {1: (3, sse)}
