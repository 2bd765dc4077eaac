"""Operator cache registry (d2d_spark/cache.py): shared-explode
persists register per-operator and release() actually drops them."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark import cache as opcache


def _docs(spark, n=40):
    rows = [(i, f"doc {i} " + " ".join(f"w{(i + j) % 7}" for j in range(12))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cache_registers_and_releases(spark):
    from d2d_spark.operators.dedup import minhash_lsh_pairs

    opcache.release()  # isolate from earlier tests
    df = _docs(spark)
    pairs = minhash_lsh_pairs(df, "text", "doc_id", jaccard_threshold=0.9)
    pairs.count()
    regs = opcache.entries("minhash_lsh")
    assert regs, "minhash should register its signature cache"
    assert all(e.storageLevel.useMemory or e.storageLevel.useDisk for e in regs)
    n = opcache.release("minhash_lsh")
    assert n == len(regs)
    # unpersist resets the storage level to NONE on the same frame
    assert all(not (e.storageLevel.useMemory or e.storageLevel.useDisk) for e in regs)
    assert opcache.entries("minhash_lsh") == []


def test_release_is_safe_before_consumption(spark):
    """Releasing too early must only cost a recompute, never change
    the result."""
    from d2d_spark.operators.ngram_lm import perplexity_self_score

    opcache.release()
    df = _docs(spark, 30)
    scored = perplexity_self_score(df, "text", "doc_id", n=3, vocab_size=500)
    assert opcache.entries("ngram_lm")
    opcache.release("ngram_lm")  # BEFORE consuming the lazy result
    a = sorted((r["doc_id"], round(r["mean_logp"], 9)) for r in scored.collect())
    opcache.release()
    b_df = perplexity_self_score(df, "text", "doc_id", n=3, vocab_size=500)
    b = sorted((r["doc_id"], round(r["mean_logp"], 9)) for r in b_df.collect())
    assert a == b
    opcache.release()


def test_release_all_and_tags(spark):
    from d2d_spark.operators.classifier import classify_self

    opcache.release()
    df = _docs(spark, 30).withColumn("lang", F.lit("en"))
    classify_self(df, "text", "lang", "doc_id", vocab_size=500).count()
    assert "nb_classifier" in opcache.tags()
    assert opcache.release() >= 1
    assert opcache.tags() == []
    assert opcache.release() == 0


def test_simhash_and_phash_register_in_cache(spark):
    from d2d_spark import cache as opcache
    from d2d_spark.operators.dedup import simhash_near_pairs
    from d2d_spark.operators.phash import phash_near_pairs

    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with shared words") for i in range(20)],
        "doc_id long, text string",
    )
    simhash_near_pairs(docs, "text", "doc_id").count()
    assert "simhash" in opcache.tags()
    assert opcache.release("simhash") >= 1

    imgs = spark.createDataFrame(
        [(i, [((i * 7 + p) % 256) for p in range(64)], 8, 8) for i in range(10)],
        "img_id long, px array<int>, w int, h int",
    )
    phash_near_pairs(imgs, "img_id", "px", "w", "h").count()
    assert "phash" in opcache.tags()
    assert opcache.release("phash") >= 1


def test_registry_mutations_are_thread_safe(spark):
    """r12 (ADVICE): register() runs from concurrent suite threads
    while release() may run on the main thread — hammer both and
    assert no entry is stranded (every registered frame is released
    exactly once across the interleaving)."""
    import threading

    from d2d_spark import cache as opcache

    opcache.release()
    df = spark.range(10)
    n_threads, per_thread = 8, 50
    registered = []
    lock = threading.Lock()

    def worker(t):
        for i in range(per_thread):
            tag = f"t{t % 4}"
            opcache.register(tag, df)
            with lock:
                registered.append(tag)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    released_early = 0
    for _ in range(20):
        released_early += opcache.release("t0")
    for th in threads:
        th.join()
    released_late = opcache.release()
    assert released_early + released_late == n_threads * per_thread
    assert opcache.tags() == []
