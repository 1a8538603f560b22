"""BPE trainer differential tests: the distributed trainer must learn the
exact same merge sequence as an independent pure-Python reference
(Sennrich-style get_stats/merge loop over a word-frequency dict)."""

from __future__ import annotations

from collections import Counter

from advanced_elb_logs_etl_spark.operators import bpe


def _reference_bpe(texts: list[str], num_merges: int, min_pair_count: int = 2):
    """Pure-Python BPE over the word-frequency table, leftmost-greedy
    non-overlapping merges, (count desc, left asc, right asc) tiebreak."""
    freq = Counter(
        w for t in texts for w in t.lower().split() if w
    )
    vocab = {tuple(list(w) + [bpe.EOW]): c for w, c in freq.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((rank, a, b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "new new newer lowest",
    "aaa aaa aaaa banana bandana",
]


def test_bpe_matches_reference_merge_for_merge(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe.bpe_train(df, num_merges=12)
    want = _reference_bpe(CORPUS, num_merges=12)
    assert got == want, (got, want)


def test_bpe_overlapping_pair_is_leftmost_greedy(spark):
    # 'aaaa' + merge (a,a): leftmost-greedy gives [aa, aa, </w>], never
    # three overlapping matches
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = bpe.bpe_train(df, num_merges=2)
    want = _reference_bpe(["aaaa aaaa aaaa"], num_merges=2)
    assert got == want
    assert got[0][1] == "a" and got[0][2] == "a"


def test_bpe_early_stop_on_min_count(spark):
    # every word unique and short: after a few merges no pair repeats
    df = spark.createDataFrame([("xy qz jk",)], "text string")
    got = bpe.bpe_train(df, num_merges=50, min_pair_count=2)
    want = _reference_bpe(["xy qz jk"], num_merges=50)
    assert got == want
    assert len(got) < 50


def test_bpe_df_surface(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    out = bpe.bpe_train_df(df, num_merges=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert all(r.pair_count >= 2 for r in out)


def _reference_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [bpe.EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_segment_matches_reference_apply(spark):
    """The string-replace apply path must segment exactly like the
    reference apply loop, for merges LEARNED from the corpus — closing
    the train->apply loop. Includes chain ('aaaa'), suffix-collision
    ('xa' vs 'a b'), and merged-symbol-reuse cases."""
    from pyspark.sql import functions as F

    train_df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = [(a, b) for _, a, b, _ in bpe.bpe_train(train_df, num_merges=10)]
    words = ["low", "lowest", "newest", "aaaa", "banana", "xa", "q",
             "widest", "newer"]
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: (r.seg, r.n)
        for r in wdf.select(
            "word",
            bpe.bpe_segment_string(F.col("word"), merges).alias("seg"),
            bpe.bpe_segment_count(F.col("word"), merges).alias("n"),
        ).collect()
    }
    for w in words:
        want = _reference_apply(w, merges)
        want_seg = "|" + "|  |".join(want) + "|"
        assert got[w][0] == want_seg, (w, got[w][0], want_seg)
        assert got[w][1] == len(want), (w, got[w][1], want)


def test_bpe_train_releases_checkpoint_storage(spark):
    """The per-round localCheckpoint blocks are released as rounds are
    superseded (ADVICE r5: DataFrame.unpersist is a no-op on checkpointed
    frames) — after training, no more persistent RDDs exist than before."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    bpe.bpe_train(df, num_merges=4)
    assert jsc.getPersistentRDDs().size() == before


def test_release_local_checkpoint_helper(spark):
    from advanced_elb_logs_etl_spark.session import release_local_checkpoint

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    ck = spark.range(10).toDF("x").localCheckpoint(eager=True)
    assert jsc.getPersistentRDDs().size() == before + 1
    assert release_local_checkpoint(ck) is True
    assert jsc.getPersistentRDDs().size() == before
    # non-checkpoint plans are a safe no-op
    assert release_local_checkpoint(spark.range(3).toDF("y")) is False


def test_bpe_token_pattern_restricts_vocab(spark):
    """token_pattern='^[a-z]+$' trains on alphabetic words only — the
    SQL-twin gate's precondition. Equivalent to the reference trainer run
    on the filtered corpus."""
    import re

    texts = ["the cat, the hat! 42 times", "a cat & a hat", "the end."]
    filtered = [
        " ".join(w for w in t.lower().split() if re.fullmatch("[a-z]+", w))
        for t in texts
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe.bpe_train(df, num_merges=4, min_pair_count=1, token_pattern="^[a-z]+$")
    want = _reference_bpe(filtered, num_merges=4, min_pair_count=1)
    assert got == want, (got, want)
