"""Randomized differential: repetition_signals vs an independent
pure-Python reference on generated multi-line docs (small vocab to
force collisions across every signal family)."""

import math
import random
from collections import Counter

from geo_spark.operators.text import repetition_signals


def _ref(text: str):
    lines = text.split("\n")
    toks = [t for part in text.split("\n") for t in part.split(" ")]
    # re-split exactly like the engine: single regex class [ \n]
    toks = []
    cur = ""
    for ch in text:
        if ch in (" ", "\n"):
            toks.append(cur)
            cur = ""
        else:
            cur += ch
    toks.append(cur)

    lc = Counter(lines)
    tot = sum(len(l) for l in lines)
    dup = sum((c - 1) * len(l) for l, c in lc.items() if c >= 2)
    dup_line = (dup * 1_000_000) // tot if tot > 0 else 0

    n_chars = len(text)
    g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    if g2:
        cnt = Counter(g2)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        top2 = (best[1] * len(best[0]) * 1_000_000) // n_chars
    else:
        top2 = 0

    g5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    c5 = Counter(g5)
    covered = set()
    for i, g in enumerate(g5):
        if c5[g] >= 2:
            covered.update(range(i, i + 5))
    dup5 = (len(covered) * 1_000_000) // len(toks)

    return {
        "n_lines": len(lines),
        "n_tokens": len(toks),
        "dup_line_frac_x1e6": dup_line,
        "top_2gram_frac_x1e6": top2,
        "dup_5gram_token_frac_x1e6": dup5,
    }


def test_repetition_signals_random_differential(spark):
    rng = random.Random(20260818)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows = []
    for i in range(120):
        n = rng.randint(1, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        # sprinkle line breaks
        text = ""
        for j, w in enumerate(words):
            text += w
            if j < n - 1:
                text += "\n" if rng.random() < 0.25 else " "
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(df, key="doc_id").collect()
    }
    assert len(got) == 120
    for i, text in rows:
        want = _ref(text)
        g = got[i]
        for k, v in want.items():
            assert g[k] == v, (i, k, g[k], v, text)
