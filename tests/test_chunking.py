"""Overlapping token chunking: hand-computed windows + reconstruction
property (every token position covered by >= 1 chunk; consecutive
chunks share exactly `overlap` positions while full)."""

from geo_spark.operators.sampling import chunk_documents


def _run(spark, text, chunk, overlap):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk, overlap).orderBy("chunk_id").collect()
    return [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in rows]


def test_hand_computed_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    # chunk 4, overlap 2 -> stride 2: windows [0-3],[2-5],[4-7],[6-9],[8-9]
    got = _run(spark, text, 4, 2)
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t2 t3 t4 t5"),
        (2, 4, "t4 t5 t6 t7"),
        (3, 4, "t6 t7 t8 t9"),
        (4, 2, "t8 t9"),
    ]


def test_short_doc_single_chunk(spark):
    got = _run(spark, "a b c", 8, 2)
    assert got == [(0, 3, "a b c")]


def test_random_differential_vs_python(spark):
    import random

    rng = random.Random(4242)
    rows = []
    for i in range(60):
        n = rng.randint(1, 50)
        rows.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 8, 3
    stride = chunk - overlap
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    want = {}
    for i, text in rows:
        toks = text.split(" ")
        k = 0
        while k * stride < len(toks):
            w = toks[k * stride : k * stride + chunk]
            want[(i, k)] = (len(w), " ".join(w))
            k += 1
    assert got == want


def test_full_coverage_property(spark):
    text = " ".join(str(i) for i in range(57))
    got = _run(spark, text, 16, 4)
    seen = set()
    for _, _, chunk_text in got:
        seen.update(int(t) for t in chunk_text.split(" "))
    assert seen == set(range(57))
    # every full window has exactly 16 tokens; stride 12 overlap check
    full = [c for c in got if c[1] == 16]
    for a, b in zip(full, full[1:]):
        ta = a[2].split(" ")
        tb = b[2].split(" ")
        assert ta[-4:] == tb[:4]  # shared overlap of 4
