"""BPE merge training (operators/bpe.bpe_train_merges): reference-example
semantics, overlap (l==r) greedy handling, determinism of ties, and the
chained-merge behavior across rounds."""

from jsonschema_spark.operators.bpe import bpe_train_merges


def test_low_lower_reference_example(spark):
    # the Sennrich-paper-style toy: "low" x2 + "lower" x1
    df = spark.createDataFrame([("low low lower",)], "text string")
    out = [tuple(r) for r in bpe_train_merges(df, "text", rounds=4).collect()]
    assert out == [
        (0, "l", "o", "lo", 3),
        (1, "lo", "w", "low", 3),
        (2, "low", "</w>", "low</w>", 2),
        (3, "e", "r", "er", 1),
    ]


def test_equal_symbol_overlap_is_greedy(spark):
    # 'a a a a </w>': pair (a,a) counts 3 overlapping occurrences but the
    # greedy merge yields 'aa aa </w>' (two non-overlapping merges)
    df = spark.createDataFrame([("aaaa",)], "text string")
    out = [tuple(r) for r in bpe_train_merges(df, "text", rounds=2).collect()]
    assert out[0] == (0, "a", "a", "aa", 3)
    # round 1 vocab must be 'aa aa </w>': ties at cnt=1 break lexicographically
    # and '</w>' sorts before 'aa'
    assert out[1] == (1, "aa", "</w>", "aa</w>", 1)


def test_word_weights_count(spark):
    # same word in many rows weights its pairs
    df = spark.createDataFrame([("xy",), ("xy",), ("xy",), ("zq",)], "text string")
    out = [tuple(r) for r in bpe_train_merges(df, "text", rounds=1).collect()]
    assert out == [(0, "x", "y", "xy", 3)]


def test_rounds_bound_and_schema(spark):
    df = spark.createDataFrame([("ab ab cd",)], "text string")
    res = bpe_train_merges(df, "text", rounds=3)
    assert res.columns == ["round", "left_sym", "right_sym", "merged", "pair_n"]
    rows = res.collect()
    assert [r["round"] for r in rows] == [0, 1, 2]


def test_apply_counts_shrink_and_conserve(spark):
    from jsonschema_spark.operators.bpe import bpe_token_counts

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "flow glow")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in bpe_token_counts(df, "doc_id", "text", rounds=4).collect()}
    # doc 1: words low(2) lower(1); pre = (3+1)*2 + (5+1) = 14
    assert out[1]["n_words"] == 3 and out[1]["n_chars_syms"] == 14
    # learned merges (l,o)(lo,w)(low,</w>)(e,r): 'low' -> 1 symbol,
    # 'lower' -> low+er+</w> = 3 symbols -> 2*1 + 3 = 5
    assert out[1]["n_bpe_syms"] == 5
    # merges always shrink-or-preserve
    assert out[2]["n_bpe_syms"] <= out[2]["n_chars_syms"]
