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
