"""First-seen-wins streaming near-dup policy (streaming/neardup.py):
single-batch replay must equal batch dedup_corpus row-for-row; multi-batch
replay must honor the cross-batch key-store blocking invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators.dedup import dedup_corpus
from advanced_elb_logs_etl_spark.streaming.neardup import (
    band_key_rows,
    first_seen_batch_step,
    replay_first_seen_dedup,
)

# Corpus with planted near-dup structure: (101, 102) near-identical,
# (201, 202, 203) a near-dup chain, the rest unique. Short docs (ids 9xx)
# have <3 tokens -> no shingles -> always kept, never blocking.
_BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away home "
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus_rows():
    return [
        (101, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
        (102, _BASE + "alpha beta gamma delta epsilon zeta eta iota"),
        (201, _BASE + "one two three four five six seven eight nine ten"),
        (202, _BASE + "one two three four five six seven eight nine zen"),
        (203, _BASE + "one two three four five six seven eight nine axe"),
        (301, "completely different content about spark structured streaming "
              "micro batches and state stores with watermark semantics here"),
        (401, "yet another unrelated document that talks about parquet file "
              "layouts z ordering and compaction planning for data lakes"),
        (901, "too short"),
    ]


def test_single_batch_equals_dedup_corpus(spark):
    docs = _docs(spark, _corpus_rows())
    got = sorted(
        r.doc_id
        for r in replay_first_seen_dedup(spark, docs, num_batches=1).collect()
    )
    want = sorted(r.doc_id for r in dedup_corpus(docs).collect())
    assert got == want and len(got) < len(_corpus_rows())


def test_batch_step_blocks_on_seen_keys(spark):
    """A doc whose band keys are already owned is dropped before the
    within-batch rule; unrelated docs pass."""
    first = _docs(spark, _corpus_rows()[:2])  # 101 kept, 102 its victim
    kept1, keys1 = first_seen_batch_step(first, None)
    assert [r.doc_id for r in kept1.collect()] == [101]

    second = _docs(
        spark,
        [
            # near-identical to 101 -> candidate-blocked by the store
            (111, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
            (301, "completely different content about spark structured "
                  "streaming micro batches and state stores here today"),
        ],
    )
    kept2, keys2 = first_seen_batch_step(second, keys1)
    assert [r.doc_id for r in kept2.collect()] == [301]
    # the new keys are 301's band keys only
    want_keys = {
        (r.band, r.key) for r in band_key_rows(second.filter("doc_id=301")).collect()
    }
    assert {(r.band, r.key) for r in keys2.collect()} == want_keys


def test_multi_batch_replay_invariants(spark):
    """Two-batch replay (id order): a later batch's kept docs share no
    band key with any EARLIER batch's kept docs (cross-batch blocking is
    candidate-level; within a batch, Jaccard-rejected collisions may
    coexist — that's the batch rule), and only shingled docs can drop."""
    rows = _corpus_rows()
    docs = _docs(spark, rows)
    kept = replay_first_seen_dedup(spark, docs, num_batches=2, with_batch_col=True)
    kept_rows = kept.collect()
    kept_ids = sorted(r.doc_id for r in kept_rows)
    assert 101 in kept_ids and 201 in kept_ids  # first of each dup group
    assert 102 not in kept_ids and 202 not in kept_ids
    assert 901 in kept_ids  # shingle-less docs always survive
    assert len({r.batch for r in kept_rows}) == 2  # genuinely two batches
    bands = band_key_rows(docs).collect()
    keys_by_doc = {}
    for r in bands:
        keys_by_doc.setdefault(r.doc_id, set()).add((r.band, r.key))
    by_batch: dict = {}
    for r in kept_rows:
        by_batch.setdefault(r.batch, set()).add(r.doc_id)
    earlier: set = set()
    for b in sorted(by_batch):
        for did in sorted(by_batch[b]):
            ks = keys_by_doc.get(did, set())
            assert not (ks & earlier), f"kept doc {did} collides cross-batch"
        for did in by_batch[b]:
            earlier |= keys_by_doc.get(did, set())
    # dropped docs all had shingles (shingle-less docs can never drop)
    dropped = sorted(set(r[0] for r in rows) - set(kept_ids))
    assert dropped and all(keys_by_doc.get(d) for d in dropped)


def test_multi_batch_cross_batch_blocking(spark):
    """A later-batch near-dup of an earlier kept doc is dropped even
    though the two never share a micro-batch."""
    rows = [
        (1, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "unrelated filler document with enough tokens to shingle "
            "nicely and form its own lsh buckets without collisions"),
        # batch 2 (higher id range): near-identical to doc 1
        (1000, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "another standalone document about completely separate "
               "topics such as gardening recipes and mountain hiking"),
    ]
    kept = replay_first_seen_dedup(spark, _docs(spark, rows), num_batches=2)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 1001]


def test_retried_batch_does_not_self_collide(spark, tmp_path):
    """Restart safety (ADVICE r6): a RETRIED micro-batch re-runs with the
    same batch id over a store already holding its own failed attempt's
    keys/batch=N partition.  The store read must exclude batch >= N, or
    the batch's docs collide with their own band keys and the retry
    overwrites kept/batch=N with an empty frame — silently losing the
    batch.  Simulated by invoking the foreachBatch step twice with the
    same batch_id."""
    import os

    from advanced_elb_logs_etl_spark.streaming.neardup import (
        _first_seen_process_batch,
    )

    store = str(tmp_path / "store")
    rows = _corpus_rows()
    other = (
        "a totally disjoint second batch corpus about orbital mechanics "
        "launch windows hohmann transfers and delta v budgets for probes "
    )
    batch0 = _docs(spark, rows[:2])   # 101 kept, 102 its victim
    batch1 = _docs(
        spark,
        [
            # within-batch dup pair on a text DISJOINT from batch 0 (so
            # candidate-level cross-batch blocking can't touch it)
            (201, other + "one two three four five six seven eight"),
            (202, other + "one two three four five six seven nine"),
            (301, "completely different content about spark structured "
                  "streaming micro batches and state stores here today"),
            (901, "too short"),
        ],
    )
    _first_seen_process_batch(batch0, 0, store, "doc_id", "text", 0.8)
    _first_seen_process_batch(batch1, 1, store, "doc_id", "text", 0.8)
    kept1 = os.path.join(store, "kept", "batch=1")
    first_attempt = sorted(
        r.doc_id for r in spark.read.parquet(kept1).collect()
    )
    assert first_attempt == [201, 301, 901]
    # retry batch 1 (same id, store now holds keys/batch=1 from attempt 1)
    _first_seen_process_batch(batch1, 1, store, "doc_id", "text", 0.8)
    retry_attempt = sorted(
        r.doc_id for r in spark.read.parquet(kept1).collect()
    )
    assert retry_attempt == first_attempt, "retry must be idempotent"
    # and batch 2 still sees both prior batches' blocking state
    near_prior = _docs(spark, [(998, rows[0][1]), (999, batch1.collect()[0].text)])
    _first_seen_process_batch(near_prior, 2, store, "doc_id", "text", 0.8)
    kept2 = spark.read.parquet(os.path.join(store, "kept", "batch=2"))
    assert kept2.count() == 0


def test_auto_prune_block_then_readmit_in_stream(spark):
    """Retention as policy (VERDICT r6 #7): with prune_keep_last set, the
    running stream prunes its own blocking state every prune_every
    batches — a near-dup arriving while the original's keys are live is
    dropped; after the prune ages those keys out, a later near-dup is
    re-admitted.  All inside ONE stream run, no manual prune call."""
    uniq = [
        "standalone filler document number %d with plenty of distinct "
        "token content to shingle and occupy its own lsh buckets %s"
        % (i, " ".join(f"w{i}x{j}" for j in range(8)))
        for i in range(4)
    ]
    rows = [
        # batch 0: the original
        (1, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
        # batch 1: near-dup arrives while keys live -> blocked; + filler
        (100, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
        (101, uniq[0]),
        # batch 2: filler (its write triggers the prune that drops batch<=1)
        (200, uniq[1]),
        # batch 3: near-dup arrives after the prune -> re-admitted
        (300, _BASE + "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    kept = replay_first_seen_dedup(
        spark,
        _docs(spark, rows),
        num_batches=4,
        prune_keep_last=1,
        prune_every=2,
    )
    kept_ids = sorted(r.doc_id for r in kept.collect())
    assert 1 in kept_ids and 101 in kept_ids and 200 in kept_ids
    assert 100 not in kept_ids, "near-dup with live keys must block"
    assert 300 in kept_ids, "near-dup after retention prune must re-admit"


def test_prune_key_store_retention(spark, tmp_path):
    """Retention pruning drops the oldest batches' BLOCKING state (a
    pruned doc stops blocking new arrivals) but never touches the kept
    output."""
    import os

    from advanced_elb_logs_etl_spark.streaming.neardup import (
        KEY_STORE_SCHEMA,
        first_seen_batch_step,
        prune_key_store,
    )

    store = str(tmp_path / "store")
    keys_dir = os.path.join(store, "keys")
    doc = (1, _BASE + "alpha beta gamma delta epsilon zeta eta theta")
    near = (99, _BASE + "alpha beta gamma delta epsilon zeta eta theta")
    # simulate three batches writing key partitions
    for bid, rows in enumerate([[doc], [(2, "some other sufficiently long "
                                        "unrelated document text here ok")],
                                [(3, "third unrelated batch document with "
                                     "plenty of words to shingle fine")]]):
        seen = (
            spark.read.schema(KEY_STORE_SCHEMA).parquet(keys_dir)
            if os.path.isdir(keys_dir)
            else None
        )
        _, new_keys = first_seen_batch_step(_docs(spark, rows), seen)
        new_keys.write.mode("overwrite").parquet(
            os.path.join(keys_dir, f"batch={bid}")
        )
    # near-dup of batch-0's doc is blocked while its keys are retained
    seen = spark.read.schema(KEY_STORE_SCHEMA).parquet(keys_dir)
    kept, _ = first_seen_batch_step(_docs(spark, [near]), seen)
    assert kept.count() == 0
    # prune to the last 2 batches: batch=0's keys go, doc 99 re-admits
    assert prune_key_store(spark, store, keep_last_batches=2) == 1
    assert sorted(os.listdir(keys_dir)) == ["batch=1", "batch=2"]
    seen = spark.read.schema(KEY_STORE_SCHEMA).parquet(keys_dir)
    kept, _ = first_seen_batch_step(_docs(spark, [near]), seen)
    assert [r.doc_id for r in kept.collect()] == [99]
    # pruning an absent store is a no-op
    assert prune_key_store(spark, str(tmp_path / "nope"), 1) == 0
