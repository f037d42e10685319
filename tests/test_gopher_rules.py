"""gopher_quality_filter: each Gopher rule (Rae et al. 2021 App. A1.1)
must trip on a handcrafted doc built to violate it (and a clean doc must
pass all), and every metric must equal an independent pure-python recomputation
(including the rules the synthetic corpus cannot exercise: duplicate
lines, symbol ratio, stop-word presence)."""

import re
from collections import Counter

import pytest


@pytest.fixture(scope="module")
def spark():
    from whitebox_tools_spark.session import get_spark

    yield get_spark(app_name="gopher-rules", cores=4, shuffle_partitions=4)


# a 60-word body that passes every default rule: mean len in [3,10], all
# alphabetic, two distinct Gopher stop words ('the', 'with'), no repeated
# 2-gram above 20% char mass, no symbols, one line
_GOOD = (
    "the quick brown fox jumps over lazy dogs with great speed today "
    "every morning before sunrise while birds sing softly near rivers "
    "that flow gently through green valleys under bright skies above "
    "mountains where eagles soar freely among clouds drifting slowly "
    "toward distant horizons beyond ancient forests full of tall pines "
    "standing quietly beside clear lakes reflecting golden light warmly"
)


def _py_gopher(text):
    """Independent scalar recomputation of every metric."""
    toks = re.split(r"\s+", text.strip()) if text.strip() else []
    n = len(toks)
    wc = sum(len(w) for w in toks)
    mean_len = wc / n if n else 0.0
    alpha = sum(1 for w in toks if re.search("[A-Za-z]", w))
    alpha_frac = alpha / n if n else 0.0
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) // 3
    sym = (n_hash + n_ell) / n if n else 0.0
    low = [w.lower() for w in toks]
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    hits = sum(1 for s in stops if s in low)
    lines = text.split("\n")
    dup = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
    grams = Counter(
        toks[i] + " " + toks[i + 1] for i in range(n - 1)
    )
    top2 = max(
        (c * (len(g) - 1) for g, c in grams.items()), default=0
    )
    top2_frac = top2 / wc if wc else 0.0
    return dict(
        n_words=n, mean_word_len=mean_len, alpha_frac=alpha_frac,
        symbol_ratio=sym, stop_hits=hits, dup_line_frac=dup,
        top2_char_frac=top2_frac,
    )


def _run(spark, docs):
    from whitebox_tools_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = gopher_quality_filter(df).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_metrics_match_python_and_rules_trip_independently(spark):
    short = "only four tiny words"                         # rule 1
    long_words = " ".join(["extraordinarily"] * 60)        # rule 2 (mean 16)
    numeric = " ".join(str(i) for i in range(60))          # rule 3 (alpha 0)
    hashy = _GOOD + " " + " ".join(["###"] * 9)            # rule 4
    no_stop = " ".join(                                    # rule 5
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 6
    )
    dup_lines = "\n".join([_GOOD[:40]] * 7 + ["x y z"] * 3)  # rule 6 (dup 0.7)
    rep2 = " ".join(["spark engine"] * 40)                 # rule 7 (one 2-gram)
    docs = [
        (0, _GOOD), (1, short), (2, long_words), (3, numeric),
        (4, hashy), (5, no_stop), (6, dup_lines), (7, rep2),
    ]
    got = _run(spark, docs)
    for did, text in docs:
        exp = _py_gopher(text)
        g = got[did]
        for k, v in exp.items():
            assert g[k] == pytest.approx(v, abs=1e-9), (did, k, g[k], v)
    assert got[0]["passes"] == 1
    # every crafted violator fails, and for the targeted rule
    assert got[1]["n_words"] < 50 and got[1]["passes"] == 0
    assert got[2]["mean_word_len"] > 10 and got[2]["passes"] == 0
    assert got[3]["alpha_frac"] < 0.8 and got[3]["passes"] == 0
    assert got[4]["symbol_ratio"] > 0.1 and got[4]["passes"] == 0
    assert got[5]["stop_hits"] < 2 and got[5]["passes"] == 0
    assert got[6]["dup_line_frac"] > 0.3 and got[6]["passes"] == 0
    assert got[7]["top2_char_frac"] > 0.2 and got[7]["passes"] == 0


def test_empty_and_single_word_docs(spark):
    got = _run(spark, [(0, ""), (1, "   "), (2, "word")])
    for did in (0, 1, 2):
        g = got[did]
        assert g["passes"] == 0
        assert g["top2_char_frac"] == 0.0 and g["dup_line_frac"] == 0.0
    assert got[0]["n_words"] == 0 and got[2]["n_words"] == 1


def test_threshold_params_flow_through(spark):
    from whitebox_tools_spark.operators.text import gopher_quality_filter

    df = spark.createDataFrame([(0, "the cat sat with joy")], "doc_id long, text string")
    strict = gopher_quality_filter(df).collect()[0]
    # a 5-word doc's densest 2-gram always exceeds 20% char mass, so the
    # loose variant must also relax the repetition rule
    loose = gopher_quality_filter(
        df, min_words=3, min_stop_hits=1, max_top2_char_frac=1.0
    ).collect()[0]
    assert strict["passes"] == 0 and loose["passes"] == 1
