"""Regression tests for the review findings: empty-text safety under
ANSI, simhash recall guarantee, sink mode translation, backup-dir
exclusion, durable write_mode staging."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

from d2d_spark.functions.text import ascii_ratio, punct_ratio, quality_score
from d2d_spark.operators.dedup import minhash_lsh_pairs, simhash_near_pairs
from d2d_spark.migrate import Migration
from d2d_spark.sources import CsvConnector, MemoryConnector, ParquetConnector, SqlFileConnector


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="d2d_fix_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_empty_text_does_not_crash_ratios(spark):
    """ANSI mode: /0 throws; empty docs must yield NULL ratios."""
    df = spark.createDataFrame([Row(text=""), Row(text="hello, world.")])
    rows = df.select(
        punct_ratio(F.col("text")).alias("p"),
        ascii_ratio(F.col("text")).alias("a"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    empty = rows[0]
    assert empty.p is None and empty.a is None
    assert rows[1].p is not None and rows[1].a == 1.0


def test_empty_text_does_not_crash_minhash(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="   "),
         Row(doc_id=3, text="the same text here"), Row(doc_id=4, text="the same text here")]
    )
    pairs = minhash_lsh_pairs(df, "text", "doc_id", jaccard_threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) not in got  # blank docs are not near-dups
    assert (3, 4) in got


def test_simhash_recall_guarantee(spark):
    """Pairs within max_hamming must ALWAYS band together now —
    construct texts whose differing simhash bits spread across many
    chunks by checking against exact hamming on the computed hashes."""
    from d2d_spark.operators.dedup import simhash64

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [Row(doc_id=i, text=base + f" tail{i % 7} mid{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows)
    hashes = {r.doc_id: r.simhash for r in simhash64(df, "text").collect()}
    want = set()
    for a in hashes:
        for b in hashes:
            if a < b:
                d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
                if d <= 12:
                    want.add((a, b))
    got = {(r.id_a, r.id_b) for r in simhash_near_pairs(df, "text", "doc_id", max_hamming=12).collect()}
    assert got == want  # exact: banding loses nothing, verify filters rest


def test_migration_to_sqlfile_default_modes(spark, tmpdir):
    """The default Migration (mode='ignore', no pks) into a .sql sink
    must not KeyError; upsert renders ON DUPLICATE KEY UPDATE."""
    src = MemoryConnector({"t": [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]}, spark)
    dst = SqlFileConnector(str(tmpdir), spark)
    Migration(src, dst, table_from="t").run()
    assert dst.read("t").count() == 2

    dst.write(src.read("t"), "t2", mode="upsert", pks=["id"])
    text = "\n".join(
        p.read_text() for p in (tmpdir / "t2.sql").glob("part-*") if p.is_file()
    )
    assert "ON DUPLICATE KEY UPDATE `v`=VALUES(`v`)" in text


def test_get_indexes_skips_backups(spark, sf_dir, tmpdir):
    from d2d_spark.session import read_table

    conn = CsvConnector(str(tmpdir), spark)
    df = read_table(spark, sf_dir, "nation")
    conn.write(df, "nation")
    conn.write(df.limit(2), "nation", backup=True)
    assert conn.get_indexes() == ["nation"]
    # migrate-all over this source must not trip on the backup dir
    done = Migration(conn, ParquetConnector(str(tmpdir / "out"), spark), mode="overwrite").run()
    assert done == ["nation"]


def test_write_mode_staging_leaves_no_debris(spark, sf_dir, tmpdir):
    from d2d_spark.operators.writes import write_mode
    from d2d_spark.session import read_table

    path = str(tmpdir / "t")
    df = read_table(spark, sf_dir, "nation")
    write_mode(df, path, mode="overwrite")
    write_mode(
        df.withColumn("n_name", F.lit("NEW")), path, mode="upsert",
        pks=["n_nationkey"], spark=spark,
    )
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert back.filter("n_name = 'NEW'").count() == df.count()
    stages = [p for p in tmpdir.iterdir() if "__stage" in p.name]
    assert stages == []


def test_salted_join_rejects_right_outer(spark):
    from d2d_spark.operators.skew import salted_join

    l = spark.createDataFrame([Row(k=1)])
    r = spark.createDataFrame([Row(k=2)])
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(l, r, on="k", how="full")


def test_keyless_default_migration_accumulates(spark, tmpdir):
    """Default (no-pks) mode='ignore' must behave like the reference's
    plain INSERT: two runs accumulate, never wipe."""
    dst = ParquetConnector(str(tmpdir), spark)
    Migration(MemoryConnector({"t": [{"a": 1}]}, spark), dst, table_from="t").run()
    Migration(MemoryConnector({"t": [{"a": 2}]}, spark), dst, table_from="t").run()
    assert dst.read("t").count() == 2


def test_key_merge_matched_null_wins(spark):
    """Dict-overwrite fidelity: a matched right NULL replaces the left
    value; only a genuine no-match keeps it."""
    from d2d_spark.operators.join import key_merge

    l = spark.createDataFrame([Row(k=1, status="A"), Row(k=2, status="B")])
    r = spark.createDataFrame([(1, None, "x")], "k bigint, status string, extra string")
    out = {x.k: (x.status, x.extra) for x in key_merge(l, r, "k", "k", how="left").collect()}
    assert out[1] == (None, "x")  # matched: right NULL wins
    assert out[2] == ("B", None)  # unmatched: left survives


def test_incremental_rollup_replay_is_idempotent(spark, sf_dir, tmpdir):
    """A replayed micro-batch (checkpoint lost, ledger intact) must
    not double-count."""
    from d2d_spark.session import read_table
    from d2d_spark.streaming.filestream import file_stream
    from d2d_spark.streaming.windows import incremental_rollup

    src, tgt = str(tmpdir / "src"), str(tmpdir / "tgt")
    ev = read_table(spark, sf_dir, "events").limit(200).cache()
    ev.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ckpt):
        incremental_rollup(
            file_stream(spark, src, schema), tgt, str(tmpdir / ckpt),
            ts_col="ts", duration="1 hour", keys=["event_type"],
        )

    run("ckpt1")
    total1 = spark.read.parquet(tgt).agg(F.sum("n_rows")).collect()[0][0]
    # fresh checkpoint => Structured Streaming redelivers everything;
    # the batch ledger must recognize and skip the replay
    run("ckpt2")
    total2 = spark.read.parquet(tgt).agg(F.sum("n_rows")).collect()[0][0]
    assert total1 == total2 == 200


def test_txt_upsert_keeps_format_options(spark, tmpdir):
    """Keyed write on a delimited-text target must re-read the target
    with the connector's sep/header options."""
    from d2d_spark.sources import TxtConnector

    conn = TxtConnector(str(tmpdir), spark, sep="|")
    df = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    conn.write(df, "t")
    conn.write(
        spark.createDataFrame([Row(id=2, v="B2"), Row(id=3, v="c")]),
        "t", mode="upsert", pks=["id"],
    )
    back = {r.id: r.v for r in conn.read("t").collect()}
    assert back == {1: "a", 2: "B2", 3: "c"}


# ------------------------- round-3 self-review regression fixes


def test_signature_store_replay_idempotent(spark, sf_dir, tmpdir):
    """A replayed batch (its signatures already in the store) must
    re-derive the original survivors, not drop every row as a
    duplicate of itself."""
    from d2d_spark.operators.dedup import SignatureStore
    from d2d_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    store = SignatureStore(str(tmpdir / "sigs"), jaccard_threshold=0.5)
    first = sorted(r.doc_id for r in store.dedup_batch(docs, "text", "doc_id").collect())
    assert first, "first batch must keep rows"
    replay = sorted(r.doc_id for r in store.dedup_batch(docs, "text", "doc_id").collect())
    assert replay == first


def test_connected_components_large_ids_no_overflow(spark):
    """xxhash64-scale ids must not overflow the convergence sum under
    ANSI mode."""
    from d2d_spark.operators.dedup import connected_components

    big = 9_100_000_000_000_000_000
    pairs = spark.createDataFrame(
        [Row(id_a=big, id_b=big + 7), Row(id_a=big + 7, id_b=big + 11)]
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {big: big, big + 7: big, big + 11: big}


def test_write_mode_restores_swap_debris(spark, sf_dir, tmpdir):
    """A target stranded in .__bak_* by a crash between the swap's two
    renames must be restored — a keyed write afterwards merges into
    the full prior data instead of reinitializing from one batch."""
    import os

    from d2d_spark.operators.writes import write_mode
    from d2d_spark.session import read_table

    target = str(tmpdir / "tbl")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = orders.limit(50)
    write_mode(base, target, mode="overwrite", spark=spark)
    n_base = spark.read.parquet(target).count()
    # simulate the crash window: target renamed away, staging never in
    os.replace(target, target + ".__bak_deadbeef")

    extra = orders.limit(60)  # 50 overlap + 10 new
    write_mode(extra, target, mode="ignore", pks=["o_orderkey"], spark=spark)
    got = spark.read.parquet(target).count()
    assert got >= n_base, "prior data lost: keyed write reinitialized the target"
    assert not os.path.exists(target + ".__bak_deadbeef")


def test_rollup_merger_restores_swap_debris(spark, sf_dir, tmpdir):
    """incremental_rollup's first-batch branch must restore swap
    debris instead of overwriting the rollup with one batch."""
    import os

    from d2d_spark.session import read_table
    from d2d_spark.streaming.windows import make_rollup_merger

    target = str(tmpdir / "rollup")
    events = read_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    merge = make_rollup_merger(target, "ts", "1 hour", ["user_id"], {"value": "sum_value"})
    merge(events.limit(500), 0)
    n0 = spark.read.parquet(target).agg(F.sum("n_rows")).collect()[0][0]
    os.replace(target, target + ".__bak_cafecafe")

    merge(events.limit(200), 1)
    n1 = spark.read.parquet(target).agg(F.sum("n_rows")).collect()[0][0]
    assert n1 == n0 + 200, f"rollup lost history: {n1} != {n0} + 200"


def test_blobstore_tmp_suffix_key_visible(spark, tmpdir):
    """A legitimate key ending in '.tmp' must appear in list() and
    read_all()."""
    from d2d_spark.sources.blobstore import BlobStore

    bs = BlobStore(str(tmpdir / "blobs"), spark)
    bs.save("report.tmp", b"hello")
    assert bs.list() == ["report.tmp"]
    rows = bs.read_all().collect()
    assert [r.key for r in rows] == ["report.tmp"]
    assert bytes(rows[0].payload) == b"hello"


def test_blobstore_long_key_rejected_before_staging(spark, tmpdir):
    """Keys whose encoding fits 255 bytes but not the staged
    '.{name}.tmp' form must fail with ValueError, not ENAMETOOLONG."""
    from d2d_spark.sources.blobstore import BlobStore

    bs = BlobStore(str(tmpdir / "blobs"), spark)
    with pytest.raises(ValueError, match="shorten the key"):
        bs.save("a" * 252, b"x")


def test_write_mode_ignore_collapses_incoming_duplicates(spark, tmpdir):
    """INSERT IGNORE semantics: two incoming rows with the same new
    key insert exactly one row (MySQL takes the first, ignores the
    rest) — never both."""
    from d2d_spark.operators.writes import write_mode

    target = str(tmpdir / "tbl")
    base = spark.createDataFrame([Row(id=1, v="a")])
    write_mode(base, target, mode="overwrite", spark=spark)
    dup_batch = spark.createDataFrame(
        [Row(id=7, v="first", seq=1), Row(id=7, v="second", seq=2), Row(id=8, v="x", seq=3)]
    ).drop("seq")
    write_mode(dup_batch, target, mode="ignore", pks=["id"], spark=spark)
    rows = spark.read.parquet(target).collect()
    ids = sorted(r.id for r in rows)
    assert ids == [1, 7, 8], f"duplicate key appended twice: {ids}"
    # order_col pins WHICH duplicate wins (min = 'first occurrence')
    target2 = str(tmpdir / "tbl2")
    write_mode(
        spark.createDataFrame([Row(id=1, v="a", seq=0)]), target2, mode="overwrite", spark=spark
    )
    dup2 = spark.createDataFrame(
        [Row(id=7, v="first", seq=1), Row(id=7, v="second", seq=2)]
    )
    write_mode(dup2, target2, mode="ignore", pks=["id"], spark=spark, order_col="seq")
    got = {r.v for r in spark.read.parquet(target2).filter("id = 7").collect()}
    assert got == {"first"}


def test_write_mode_cleans_stale_staging(spark, sf_dir, tmpdir):
    """A crashed keyed write's .__stage_* directory must be removed by
    the next write, not leaked forever."""
    import os

    from d2d_spark.operators.writes import write_mode
    from d2d_spark.session import read_table

    target = str(tmpdir / "tbl")
    base = read_table(spark, sf_dir, "orders").select("o_orderkey").limit(20)
    write_mode(base, target, mode="overwrite", spark=spark)
    stale = target + ".__stage_deadbeef"
    os.makedirs(stale)
    write_mode(base.limit(5), target, mode="ignore", pks=["o_orderkey"], spark=spark)
    assert not os.path.exists(stale)
