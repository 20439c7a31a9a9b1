"""Streaming toponym resolution: the geocoder as a stateless
stream-static stage.

Every document carries its whole resolution problem in one row (its
own token multiset), so the batch operator's three aggregations
(mention counts, stage-1 pick, anchor) collapse to per-row work: ONE
mapInPandas over the stream with the gazetteer shipped in the task
closure (gazetteers are dimension-sized by definition — the same
broadcast the batch path does).  No watermark, no state store, exactly
one output burst per document; drained-stream == batch equivalence is
asserted in tests/test_streaming_geocode.py.

Semantics are the batch contract verbatim (operators/geocode.py):
population prior (ties -> min geo_id), then one coherence re-pick
against the floor-division anchor — python ``//`` on the non-negative
coordinate contract equals Spark ``div`` and DuckDB ``//``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (parity import)


def stream_toponym_resolve(
    docs: DataFrame,
    gazetteer: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    name_col: str = "name",
    geo_id_col: str = "geo_id",
    pop_col: str = "population",
    lat_col: str = "lat_u",
    lng_col: str = "lng_u",
) -> DataFrame:
    """(key, name, n_mentions, geo_id, lat_u, lng_u) — one row per
    (document, mentioned gazetteer name), identical to the batch
    :func:`geo_spark.operators.geocode.toponym_resolve`."""
    gz: dict[str, list] = {}
    for r in gazetteer.select(
        name_col, geo_id_col, pop_col, lat_col, lng_col
    ).collect():
        gz.setdefault(r[name_col], []).append(
            (int(r[geo_id_col]), int(r[pop_col]), int(r[lat_col]), int(r[lng_col]))
        )
    key_type = docs.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, name string, n_mentions long, "
        "geo_id long, lat_u long, lng_u long"
    )

    def fn(batches):
        for pdf in batches:
            out = []
            for k, text in zip(pdf[key], pdf[text_col]):
                counts: dict[str, int] = {}
                # the batch tokenizer verbatim: split on " +" runs
                for w in re.split(" +", text or ""):
                    if w and w in gz:
                        counts[w] = counts.get(w, 0) + 1
                if not counts:
                    continue
                s1 = {
                    n: max(gz[n], key=lambda e: (e[1], -e[0]))
                    for n in counts
                }
                alat = sum(e[2] for e in s1.values()) // len(s1)
                alng = sum(e[3] for e in s1.values()) // len(s1)
                for n, c in counts.items():
                    g, _, la, lo = min(
                        gz[n],
                        key=lambda e: (
                            (e[2] - alat) ** 2 + (e[3] - alng) ** 2,
                            -e[1],
                            e[0],
                        ),
                    )
                    out.append((k, n, c, g, la, lo))
            yield pd.DataFrame(
                out,
                columns=[
                    key, "name", "n_mentions", "geo_id", "lat_u", "lng_u",
                ],
            )

    return docs.mapInPandas(fn, schema)
