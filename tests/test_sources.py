"""Connector layer: file-format round-trips, .sql dump parse/render
round-trip (property: read(write(df)) == df), archive read, memory
tables, JDBC option/DDL assembly, Excel gating."""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

from d2d_spark.session import read_table
from d2d_spark.sources import (
    AvroConnector,
    CsvConnector,
    JsonlConnector,
    MemoryConnector,
    OrcConnector,
    ParquetConnector,
    SqlFileConnector,
    TxtConnector,
    kv_pairs,
    read_zip,
)
from d2d_spark.sources.ddl import jdbc_column_types, mysql_ddl
from d2d_spark.sources.jdbc import JdbcConnector, staged_merge_sql
from d2d_spark.sources.sqlfile import parse_values, read_sql_dump


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="d2d_src_")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def _nation(spark, sf_dir):
    return read_table(spark, sf_dir, "nation")


def _sorted_rows(df, key="n_nationkey"):
    return [tuple(r) for r in df.orderBy(key).collect()]


# --- file formats ----------------------------------------------------


@pytest.mark.parametrize("cls", [CsvConnector, JsonlConnector, ParquetConnector, OrcConnector])
def test_file_roundtrip(spark, sf_dir, tmpdir, cls):
    conn = cls(str(tmpdir), spark)
    df = _nation(spark, sf_dir)
    conn.write(df, "nation")
    assert conn.get_indexes() == ["nation"]
    back = conn.read("nation")
    assert sorted(back.columns) == sorted(df.columns)
    assert back.count() == df.count()
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in df.collect()}
    assert got == want


def test_avro_gate_or_roundtrip(spark, sf_dir, tmpdir):
    # spark-avro is a separate module; when absent the connector must
    # refuse at construction with a clear gate error, when present it
    # must behave like any other file connector
    try:
        conn = AvroConnector(str(tmpdir), spark)
    except NotImplementedError as e:
        assert "spark-avro" in str(e)
        return
    df = _nation(spark, sf_dir)
    conn.write(df, "nation")
    assert _sorted_rows(conn.read("nation")) == _sorted_rows(df)


def test_txt_sep_roundtrip(spark, sf_dir, tmpdir):
    conn = TxtConnector(str(tmpdir), spark, sep="|")
    df = _nation(spark, sf_dir).select("n_nationkey", "n_name")
    conn.write(df, "nation")
    back = conn.read("nation")
    assert _sorted_rows(back) == _sorted_rows(df)


def test_write_backup(spark, sf_dir, tmpdir):
    conn = ParquetConnector(str(tmpdir), spark)
    df = _nation(spark, sf_dir)
    conn.write(df, "nation")
    conn.write(df.limit(3), "nation", backup=True)
    baks = [n for n in os.listdir(tmpdir) if ".bak" in n]
    assert len(baks) == 1
    assert conn.read("nation").count() == 3


def test_write_mode_ignore_and_upsert(spark, sf_dir, tmpdir):
    conn = ParquetConnector(str(tmpdir), spark)
    df = _nation(spark, sf_dir)
    conn.write(df, "nation")
    # ignore: existing keys survive, new keys append
    incoming = df.limit(5).withColumn("n_name", F.lit("CHANGED")).unionByName(
        df.limit(1).withColumn("n_nationkey", F.lit(999))
    )
    conn.write(incoming, "nation", mode="ignore", pks=["n_nationkey"])
    back = conn.read("nation")
    assert back.count() == df.count() + 1
    assert back.filter("n_name = 'CHANGED'").count() == 0
    # upsert: incoming wins
    conn.write(incoming, "nation", mode="upsert", pks=["n_nationkey"])
    back = conn.read("nation")
    assert back.count() == df.count() + 1
    assert back.filter("n_name = 'CHANGED'").count() == 5  # the 999-key row keeps its original name


# --- .sql dump -------------------------------------------------------


def test_parse_values_pathological():
    seg = r"""(1,'it''s \'ok\'',NULL,3.5,b'0101',0x1F,'emoji 🎉','a,b(c)')"""
    rows = parse_values(seg)
    assert rows == [[1, "it's 'ok'", None, 3.5, 5, 31, "emoji 🎉", "a,b(c)"]]


def test_parse_values_multirow():
    rows = parse_values("(1,'a'),(2,'b'),(3,NULL);")
    assert rows == [[1, "a"], [2, "b"], [3, None]]


def test_sqlfile_roundtrip(spark, sf_dir, tmpdir):
    conn = SqlFileConnector(str(tmpdir), spark)
    df = _nation(spark, sf_dir)
    conn.write(df, "nation", pks=["n_nationkey"])
    assert (tmpdir / "nation.ddl.sql").exists()
    ddl = (tmpdir / "nation.ddl.sql").read_text()
    assert "PRIMARY KEY (`n_nationkey`)" in ddl and "`n_name` text" in ddl
    back = conn.read("nation")
    got = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in back.collect()}
    want = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in df.collect()}
    assert got == want


def test_sqlfile_compress_and_modes(spark, sf_dir, tmpdir):
    conn = SqlFileConnector(str(tmpdir), spark)
    df = _nation(spark, sf_dir).coalesce(1)
    conn.write(df, "nation", mode="ignore", compress=10, duplicate_update="`n_name`=VALUES(`n_name`)")
    text = "\n".join(
        p.read_text() for p in (tmpdir / "nation.sql").glob("part-*") if p.is_file()
    )
    assert "INSERT IGNORE INTO `nation`" in text
    assert "ON DUPLICATE KEY UPDATE" in text
    n_stmts = text.count("INSERT IGNORE")
    assert n_stmts == 3  # 25 rows / 10 per statement
    back = conn.read("nation")
    assert back.count() == df.count()


def test_read_sql_dump_with_create_table(spark, tmpdir):
    dump = tmpdir / "t.sql"
    dump.write_text(
        "-- dump\n"
        "CREATE TABLE `t` (\n"
        "  `id` bigint NOT NULL,\n"
        "  `name` varchar(64),\n"
        "  PRIMARY KEY (`id`)\n"
        ");\n"
        "INSERT INTO `t` VALUES (1,'x'),(2,'y');\n"
        "INSERT INTO `t` VALUES (3,NULL);\n"
    )
    df = read_sql_dump(spark, str(dump))
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {1: "x", 2: "y", 3: None}


def test_read_sql_dump_comment_bomb_refused(spark, tmpdir, monkeypatch):
    """A dump that is mostly comments must fail loudly at the DDL cap
    instead of collecting every non-INSERT line to the driver."""
    import d2d_spark.sources.sqlfile as sqlfile_mod

    dump = tmpdir / "bomb.sql"
    dump.write_text(
        "".join(f"-- filler comment line {i}\n" for i in range(50))
        + "INSERT INTO `t` VALUES (1,'x');\n"
    )
    monkeypatch.setattr(sqlfile_mod, "_MAX_DDL_LINES", 10)
    with pytest.raises(ValueError, match="non-INSERT lines"):
        read_sql_dump(spark, str(dump))
    # under the cap the same dump parses fine
    monkeypatch.setattr(sqlfile_mod, "_MAX_DDL_LINES", 1000)
    assert read_sql_dump(spark, str(dump)).count() == 1


def test_sqlfile_append_keeps_both_batches(spark, tmpdir):
    """Regression (r2 verdict #4): append mode must add statements to
    the dump, not clobber the first batch."""
    conn = SqlFileConnector(str(tmpdir), spark)
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    b2 = spark.createDataFrame([(3, "c")], "id bigint, name string")
    conn.write(b1, "t", mode="append", pks=["id"])
    conn.write(b2, "t", mode="append", pks=["id"])
    back = conn.read("t")
    assert {r.id: r.name for r in back.collect()} == {1: "a", 2: "b", 3: "c"}
    # overwrite still replaces
    conn.write(b2, "t", mode="overwrite", pks=["id"])
    assert {r.id for r in conn.read("t").collect()} == {3}


def test_read_sql_dump_multitable_default_first(spark, tmpdir):
    """Regression (r2 verdict #4): table=None on a two-table dump must
    yield ONLY the first table, never a schema-mixed union."""
    dump = tmpdir / "multi.sql"
    dump.write_text(
        "CREATE TABLE `alpha` (\n  `id` bigint,\n  `name` varchar(8)\n);\n"
        "INSERT INTO `alpha` VALUES (1,'x'),(2,'y');\n"
        "CREATE TABLE `beta` (\n  `bid` bigint,\n  `score` double\n);\n"
        "INSERT INTO `beta` VALUES (9,1.5);\n"
    )
    df = read_sql_dump(spark, str(dump))
    assert set(df.columns) == {"id", "name"}
    assert {r.id: r.name for r in df.collect()} == {1: "x", 2: "y"}
    beta = read_sql_dump(spark, str(dump), table="beta")
    assert {r.bid: r.score for r in beta.collect()} == {9: 1.5}
    # no-DDL dump: first INSERT's table decides
    dump2 = tmpdir / "noddl.sql"
    dump2.write_text(
        "INSERT INTO `g` (`id`, `v`) VALUES (1,'a');\n"
        "INSERT INTO `h` (`hid`) VALUES (7);\n"
    )
    df2 = read_sql_dump(spark, str(dump2))
    assert set(df2.columns) == {"id", "v"} and df2.count() == 1


# --- archive ---------------------------------------------------------


def test_read_zip(spark, tmpdir):
    zpath = tmpdir / "data.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("a.csv", "id,name\n1,x\n2,y\n")
        zf.writestr("b.csv", "id,name\n3,z\n")
    df = read_zip(spark, str(zpath))
    assert {(r.id, r.name) for r in df.collect()} == {("1", "x"), ("2", "y"), ("3", "z")}


def _vint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _make_rar5(members, method=0):
    """Hand-built RAR5 archive of stored members (test fixture — the
    sandbox has no rar writer either)."""
    import struct
    import zlib

    def block(btype, flags, fields, data=b""):
        hdr = _vint(btype) + _vint(flags)
        if flags & 0x02:
            hdr += _vint(len(data))
        hdr += fields
        return struct.pack("<I", zlib.crc32(hdr)) + _vint(len(hdr)) + hdr + data

    out = bytearray(b"Rar!\x1a\x07\x01\x00")
    out += block(1, 0, _vint(0))  # main archive header
    for name, payload in members:
        nb = name.encode()
        fields = (
            _vint(0)  # file flags
            + _vint(len(payload))  # unpacked size
            + _vint(0)  # attributes
            + _vint(method << 7)  # compression info
            + _vint(0)  # host os
            + _vint(len(nb))
            + nb
        )
        out += block(2, 0x02, fields, payload)
    out += block(5, 0, _vint(0))  # end of archive
    return bytes(out)


def _make_rar4(members, method=0x30):
    import struct
    import zlib

    out = bytearray(b"Rar!\x1a\x07\x00")
    out += struct.pack("<HBHH", 0, 0x73, 0, 13) + b"\0" * 6  # main header
    for name, payload in members:
        nb = name.encode()
        out += struct.pack("<HBHH", 0, 0x74, 0, 7 + 25 + len(nb))
        out += struct.pack(
            "<IIBIIBBHI",
            len(payload), len(payload), 0, zlib.crc32(payload), 0, 29, method, len(nb), 0,
        )
        out += nb + payload
    out += struct.pack("<HBHH", 0, 0x7B, 0, 7)  # end of archive
    return bytes(out)


def test_read_rar_stored_members(spark, tmpdir):
    """Stored-member rar archives (both generations) read without the
    rarfile package through the self-contained container parser."""
    from d2d_spark.sources.archive import read_rar

    (tmpdir / "a5.rar").write_bytes(
        _make_rar5([("a.csv", b"id,name\n1,x\n2,y\n"), ("b.csv", b"id,name\n3,z\n")])
    )
    df5 = read_rar(spark, str(tmpdir / "a5.rar"))
    assert {(r.id, r.name) for r in df5.collect()} == {("1", "x"), ("2", "y"), ("3", "z")}

    (tmpdir / "a4.rar").write_bytes(_make_rar4([("c.csv", b"id,name\n4,w\n")]))
    df4 = read_rar(spark, str(tmpdir / "a4.rar"))
    assert {(r.id, r.name) for r in df4.collect()} == {("4", "w")}


def test_rar_lite_compressed_member_clear_error():
    """Compressed members (method != store) must raise the rarfile
    capability gate, not mis-decode; non-rar bytes are rejected."""
    from d2d_spark.sources.rar_lite import rar_members

    with pytest.raises(NotImplementedError, match="rarfile"):
        list(rar_members(_make_rar5([("x.csv", b"a,b\n1,2\n")], method=3)))
    with pytest.raises(NotImplementedError, match="rarfile"):
        list(rar_members(_make_rar4([("x.csv", b"a,b\n1,2\n")], method=0x33)))
    with pytest.raises(ValueError, match="signature"):
        list(rar_members(b"PK\x03\x04 not a rar"))


# --- memory ----------------------------------------------------------


def test_memory_connector(spark):
    mem = MemoryConnector({"t": [{"k": 1, "v": "a"}, {"k": 1, "v": "b"}, {"k": 2, "v": "c"}]}, spark)
    assert mem.get_indexes() == ["t"]
    assert mem.get_count("t") == 3
    assert mem.get_dict_kv("t", "k", "v") == {1: "b", 2: "c"}
    assert mem.get_dict_kv_set("t", "k", "v") == {1: {"a", "b"}, 2: {"c"}}
    df = mem.read("t")
    mem.write(df.filter("k = 2"), "t2")
    assert mem.tables["t2"] == [{"k": 2, "v": "c"}]
    got = kv_pairs(df, "k", "v", collapse="set").collect()
    assert {r.k: set(r.v) for r in got} == {1: {"a", "b"}, 2: {"c"}}


# --- blob store -------------------------------------------------------


def test_blobstore_distinct_keys_never_collide(spark, tmpdir):
    """ADVICE r2: 'a/b' and 'a:b' must be two blobs, and every read
    path must return the ORIGINAL keys, not sanitized shadows."""
    from d2d_spark.sources.blobstore import BlobStore

    store = BlobStore(str(tmpdir / "store"), spark)
    store.save("a/b", b"one")
    store.save("a:b", b"two")
    store.save("doc café +%", b"three")
    assert store.get("a/b") == b"one" and store.get("a:b") == b"two"
    assert store.get("doc café +%") == b"three"
    assert sorted(store.list()) == ["a/b", "a:b", "doc café +%"]
    got = {r.key: bytes(r.payload) for r in store.read_all().collect()}
    assert got == {"a/b": b"one", "a:b": b"two", "doc café +%": b"three"}
    # hostile keys cannot escape the root
    store.save("../escape", b"x")
    import os as _os

    assert _os.listdir(str(tmpdir / "store")) and not (tmpdir / "escape").exists()
    with pytest.raises(ValueError):
        store.save("k" * 300, b"x")
    with pytest.raises(ValueError):
        store.save("", b"x")


def test_blobstore_tmp_staging_hidden(spark, tmpdir):
    """ADVICE r2: crash-leaked temp files are dot-prefixed, invisible
    to list() and the binaryFile scan."""
    from d2d_spark.sources.blobstore import BlobStore

    store = BlobStore(str(tmpdir / "store"), spark)
    store.save("good", b"ok")
    # simulate a crash mid-save: a leaked staging file. All staging is
    # dot-prefixed — a bare '*.tmp' name is indistinguishable from a
    # legitimate key 'x.tmp' and is therefore NOT treated as debris
    # (see test_blobstore_tmp_suffix_key_visible).
    (tmpdir / "store" / ".half.tmp").write_bytes(b"partial")
    assert store.list() == ["good"]
    assert {r.key for r in store.read_all().collect()} == {"good"}


def test_blobstore_remote_root_fails_fast(spark, tmpdir):
    """ADVICE r2: a root plain open() can't reach must refuse, not
    silently scatter blobs."""
    from d2d_spark.sources.blobstore import BlobStore

    store = BlobStore(str(tmpdir / "store"), spark)
    df = spark.createDataFrame([("k", bytearray(b"v"))], "key string, payload binary")
    store.root = "s3a://bucket/prefix"
    with pytest.raises(ValueError, match="fsspec/Hadoop opener"):
        store.save_dataframe(df, "key", "payload")


# --- jdbc (no server: options/DDL only) ------------------------------


def test_jdbc_options_and_ddl(spark, sf_dir):
    conn = JdbcConnector("jdbc:mysql://h/db", spark, user="u", password="p", fetchsize=5000)
    opts = conn.read_options("orders", condition="o_orderkey < 100")
    assert opts["dbtable"] == "(SELECT * FROM orders WHERE o_orderkey < 100) AS __src"
    assert opts["fetchsize"] == "5000"
    opts = conn.read_options("orders", partition_column="o_orderkey", num_partitions=16, lower_bound=0, upper_bound=1000)
    assert opts["numPartitions"] == "16"
    with pytest.raises(ValueError):
        conn.read_options("orders", partition_column="o_orderkey")

    df = read_table(spark, sf_dir, "orders")
    ddl = mysql_ddl("orders", df.schema, pks=["o_orderkey"])
    assert "`o_orderkey` bigint NOT NULL" in ddl
    assert "`o_orderstatus` text" in ddl
    assert "PRIMARY KEY (`o_orderkey`)" in ddl
    cols = jdbc_column_types(df.schema, pks=["o_orderkey"])
    assert "o_orderkey bigint" in cols

    stmts = staged_merge_sql("t", ["a", "b"], "upsert")
    assert "ON DUPLICATE KEY UPDATE" in stmts[0] and stmts[1].startswith("DROP TABLE")


def test_staged_merge_sql_dialects():
    """Regression (r2 verdict #5): the staged merge must speak each
    engine's grammar, not emit MySQL everywhere."""
    from d2d_spark.sources.jdbc import url_dialect

    assert url_dialect("jdbc:postgresql://h/db") == "postgresql"
    assert url_dialect("jdbc:clickhouse://h:8123/db") == "clickhouse"
    assert url_dialect("jdbc:oracle:thin:@h:1521/orcl") == "oracle"
    assert url_dialect("jdbc:mysql://h/db") == "mysql"

    cols, pks = ["id", "v"], ["id"]
    pg_up = staged_merge_sql("t", cols, "upsert", "postgresql", pks)
    assert 'ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"' in pg_up[0]
    pg_ig = staged_merge_sql("t", cols, "ignore", "postgresql", pks)
    assert 'ON CONFLICT ("id") DO NOTHING' in pg_ig[0]
    assert pg_ig[1] == 'DROP TABLE "t__stage"'

    ch_ig = staged_merge_sql("t", cols, "ignore", "clickhouse", pks)
    assert "LEFT ANTI JOIN" in ch_ig[0]
    ch_up = staged_merge_sql("t", cols, "upsert", "clickhouse", pks)
    assert ch_up[0].startswith("DELETE FROM `t` WHERE (`id`) IN")
    assert ch_up[1].startswith("INSERT INTO `t`")

    ora = staged_merge_sql("t", cols, "upsert", "oracle", pks)
    assert ora[0].startswith('MERGE INTO "t" t USING "t__stage" s ON (t."id" = s."id")')
    assert 'WHEN MATCHED THEN UPDATE SET t."v" = s."v"' in ora[0]
    assert "WHEN NOT MATCHED THEN INSERT" in ora[0]
    ora_ig = staged_merge_sql("t", cols, "ignore", "oracle", pks)
    assert "WHEN MATCHED" not in ora_ig[0]

    # non-MySQL dialects have no engine-side key to fall back on
    with pytest.raises(ValueError):
        staged_merge_sql("t", cols, "upsert", "postgresql")


def test_create_table_sql_dialects(spark, sf_dir):
    """Regression (r2 verdict #5): target bootstrap emits an explicit
    PRIMARY KEY per dialect."""
    from d2d_spark.sources.ddl import create_table_sql

    df = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    my = create_table_sql("t", df.schema, ["o_orderkey"], "mysql")
    assert my.startswith("CREATE TABLE IF NOT EXISTS `t`")
    assert "PRIMARY KEY (`o_orderkey`)" in my and "`o_orderkey` bigint NOT NULL" in my

    pg = create_table_sql("t", df.schema, ["o_orderkey"], "postgresql")
    assert 'PRIMARY KEY ("o_orderkey")' in pg and '"o_totalprice" double precision' in pg

    ch = create_table_sql("t", df.schema, ["o_orderkey"], "clickhouse")
    assert "ENGINE = MergeTree ORDER BY (`o_orderkey`)" in ch
    assert "Nullable(Float64)" in ch and "Nullable(Int64)" not in ch.split("ORDER BY")[0].split("`o_orderkey`")[1].split("\n")[0]

    ora = create_table_sql("t", df.schema, ["o_orderkey"], "oracle")
    assert ora.startswith("BEGIN EXECUTE IMMEDIATE") and "SQLCODE != -955" in ora
    assert '"o_orderkey" NUMBER(19) NOT NULL' in ora


def test_excel_roundtrip_single_workbook(spark, tmpdir):
    """Byte-level xlsx roundtrip (openpyxl when installed, the
    self-contained xlsx_lite codec otherwise): write + distributed
    read, sheet rollover across the max_rows boundary."""
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark, max_rows_per_sheet=7)
    df = spark.createDataFrame(
        [Row(k=i, name=f"row <&> {i}", score=i * 1.5) for i in range(20)]
    )
    conn.write(df, "t")
    assert conn.get_indexes() == ["t"]
    back = conn.read("t")
    assert back.count() == 20  # 3 sheets (7+7+6) union back to 20 rows
    got = {(r.k, r.name, r.score) for r in back.collect()}
    assert got == {(i, f"row <&> {i}", i * 1.5) for i in range(20)}


def test_excel_distributed_parts_roundtrip(spark, tmpdir):
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark)
    df = spark.createDataFrame([Row(k=i, t=f"v{i}") for i in range(50)]).repartition(4)
    conn.write(df, "p", distributed=True)
    parts = sorted(p.name for p in (tmpdir / "p.xlsx.d").iterdir())
    assert parts and all(p.startswith("part-") for p in parts)
    back = conn.read("p")
    assert sorted((r.k, r.t) for r in back.collect()) == [(i, f"v{i}") for i in range(50)]


def test_xls_connector_roundtrip(spark, tmpdir):
    """Legacy BIFF8 .xls roundtrip through the self-contained
    xls_lite codec (no xlrd/xlwt): write + distributed read with
    sheet rollover, strings/floats/bools/NULLs preserved."""
    from d2d_spark.sources.excel import XlsConnector

    conn = XlsConnector(str(tmpdir), spark, max_rows_per_sheet=7)
    df = spark.createDataFrame(
        [Row(k=float(i), name=f"légacy row {i}", flag=i % 2 == 0) for i in range(20)]
    )
    conn.write(df, "t")
    assert conn.get_indexes() == ["t"]
    assert (tmpdir / "t.xls").exists()
    back = conn.read("t")
    got = {(r.k, r.name, r.flag) for r in back.collect()}
    assert got == {(float(i), f"légacy row {i}", i % 2 == 0) for i in range(20)}


def test_xls_distributed_parts_roundtrip(spark, tmpdir):
    from d2d_spark.sources.excel import XlsConnector

    conn = XlsConnector(str(tmpdir), spark)
    df = spark.createDataFrame([Row(k=float(i), t=f"v{i}") for i in range(50)]).repartition(4)
    conn.write(df, "p", distributed=True)
    parts = sorted(p.name for p in (tmpdir / "p.xls.d").iterdir())
    assert parts and all(p.startswith("part-") and p.endswith(".xls") for p in parts)
    back = conn.read("p")
    assert sorted((r.k, r.t) for r in back.collect()) == [(float(i), f"v{i}") for i in range(50)]


def test_xls_sst_continue_spanning_strings(tmpdir):
    """SST strings big enough to span CONTINUE records — including
    mid-string splits that re-emit the encoding flag, in both the
    compressed (latin-1) and UTF-16 forms — must round-trip exactly."""
    import io

    import pandas as pd

    from d2d_spark.sources.xls_lite import read_sheets, write_sheets

    long_ascii = "".join(chr(ord("a") + (i % 26)) for i in range(9000))
    long_unicode = "".join(chr(0x100 + (i % 500)) for i in range(7000))
    pdf = pd.DataFrame(
        {
            "a": [long_ascii, long_unicode, "short"],
            "b": [1.0, 2.0, 3.0],
        }
    )
    buf = io.BytesIO()
    write_sheets([("s", pdf)], buf)
    back = read_sheets(buf.getvalue())["s"]
    assert list(back["a"]) == [long_ascii, long_unicode, "short"]
    assert list(back["b"]) == [1.0, 2.0, 3.0]


def test_xls_sst_header_at_record_boundary(tmpdir):
    """A string whose cch/flags header lands exactly at the end of an
    SST record: the char data then STARTS a CONTINUE record and begins
    with a grbit byte even though zero chars were consumed — the
    reader must re-read the flag there, not decode it as text."""
    import io

    import pandas as pd

    from d2d_spark.sources.xls_lite import read_sheets, write_sheets

    filler = "a" * 8205  # leaves exactly 3 bytes of record room for the next header
    probe = "Ā" * 10
    pdf = pd.DataFrame({"a": [filler, probe]})
    buf = io.BytesIO()
    write_sheets([("s", pdf)], buf)
    back = read_sheets(buf.getvalue())["s"]
    assert list(back["a"]) == [filler, probe]


def test_xls_biff8_limits_clear_errors(spark, tmpdir):
    """Row/column/string caps fail loudly, not via struct.error."""
    import io

    import pandas as pd
    import pytest as _pytest

    from d2d_spark.sources.excel import XlsConnector
    from d2d_spark.sources.xls_lite import write_sheets

    with _pytest.raises(ValueError, match="65,536"):
        write_sheets([("s", pd.DataFrame({"a": range(70_000)}))], io.BytesIO())
    with _pytest.raises(ValueError, match="256"):
        wide = pd.DataFrame([[1.0] * 300], columns=[f"c{i}" for i in range(300)])
        write_sheets([("s", wide)], io.BytesIO())
    with _pytest.raises(ValueError, match="32,767"):
        write_sheets([("s", pd.DataFrame({"a": ["x" * 40_000]}))], io.BytesIO())
    # the connector's default rollover keeps each sheet under the cap
    conn = XlsConnector(str(tmpdir), spark)
    assert conn.max_rows_per_sheet == 65_535


def test_xls_large_workbook_difat(tmpdir):
    """A workbook stream past ~7 MB needs chained DIFAT sectors (the
    109-entry header DIFAT only covers 109 FAT sectors)."""
    import io

    import pandas as pd

    from d2d_spark.sources.xls_lite import read_sheets, write_sheets

    pdf = pd.DataFrame({f"c{i}": [float(r * 8 + i) for r in range(60_000)] for i in range(8)})
    buf = io.BytesIO()
    write_sheets([("s", pdf)], buf)
    assert len(buf.getvalue()) > 7_000_000
    back = read_sheets(buf.getvalue())["s"]
    assert len(back) == 60_000
    assert list(back.iloc[-1]) == [float(59_999 * 8 + i) for i in range(8)]


def test_xls_biff5_rejected(tmpdir):
    """A BIFF5 ('Book' stream, BOF version 0x0500) workbook must be
    refused with a clear error, not silently mis-decoded."""
    import struct

    import pytest as _pytest

    from d2d_spark.sources import xls_lite as X

    biff5_bof = X._rec(X._BOF, struct.pack("<HH", 0x0500, 0x0005))
    stream = biff5_bof + X._rec(X._EOF, b"")
    with _pytest.raises(NotImplementedError, match="BIFF8"):
        X.read_sheets(X._cfb_wrap(stream))


def test_rar4_zero_size_block_raises(tmpdir):
    """A corrupt RAR4 block declaring header size 0 must raise, not
    loop forever in the executor."""
    import struct

    import pytest as _pytest

    from d2d_spark.sources.rar_lite import rar_members

    bad = b"Rar!\x1a\x07\x00" + struct.pack("<HBHH", 0, 0x73, 0, 0)
    with _pytest.raises(ValueError, match="corrupt"):
        list(rar_members(bad))


def test_rar_unwanted_compressed_member_skipped(spark, tmpdir):
    """One compressed member of an unwanted type must not fail an
    archive whose wanted members are all stored."""
    from d2d_spark.sources.archive import read_rar
    from d2d_spark.sources.rar_lite import rar_members

    # build one archive holding a compressed .png and a stored .csv
    import struct
    import zlib

    def block(btype, flags, fields, data=b""):
        hdr = _vint(btype) + _vint(flags)
        if flags & 0x02:
            hdr += _vint(len(data))
        hdr += fields
        return struct.pack("<I", zlib.crc32(hdr)) + _vint(len(hdr)) + hdr + data

    def file_block(name, payload, method):
        nb = name.encode()
        fields = (
            _vint(0) + _vint(len(payload)) + _vint(0)
            + _vint(method << 7) + _vint(0) + _vint(len(nb)) + nb
        )
        return block(2, 0x02, fields, payload)

    out = bytearray(b"Rar!\x1a\x07\x01\x00")
    out += block(1, 0, _vint(0))
    out += file_block("logo.png", b"\x00" * 10, method=3)  # compressed, unwanted
    out += file_block("data.csv", b"id,name\n9,q\n", method=0)  # stored, wanted
    out += block(5, 0, _vint(0))
    (tmpdir / "mixed.rar").write_bytes(bytes(out))

    got = dict(rar_members(bytes(out), want=lambda n: n.endswith(".csv")))
    assert got == {"data.csv": b"id,name\n9,q\n"}
    df = read_rar(spark, str(tmpdir / "mixed.rar"), member_suffix=".csv")
    assert {(r.id, r.name) for r in df.collect()} == {("9", "q")}


def test_xls_reader_rk_and_mulrk_cells(tmpdir):
    """Hand-built worksheet with RK and MULRK records (emitted by real
    producers, never by our writer) decodes to the right numbers."""
    import struct

    import pandas as pd

    from d2d_spark.sources import xls_lite as X

    sst = X._sst_records(["h1", "h2", "h3"], 3)
    header_cells = b"".join(
        X._rec(X._LABELSST, struct.pack("<HHHI", 0, c, 15, c)) for c in range(3)
    )
    rk_int = (42 << 2) | 2
    rk_div = (4242 << 2) | 2 | 1  # 42.42 via /100
    rk_f = struct.unpack("<I", struct.pack("<d", 0.5)[4:])[0] & 0xFFFFFFFC
    data_cells = X._rec(X._RK, struct.pack("<HHHI", 1, 0, 15, rk_int)) + X._rec(
        X._MULRK,
        struct.pack("<HH", 1, 1)
        + struct.pack("<HI", 15, rk_div)
        + struct.pack("<HI", 15, rk_f)
        + struct.pack("<H", 2),
    )
    sheet = X._bof(0x0010) + header_cells + data_cells + X._rec(X._EOF, b"")
    bs_name = X._short_string("s")
    globals_len = len(X._bof(0x0005)) + (4 + 6 + len(bs_name)) + len(sst) + 4
    stream = (
        X._bof(0x0005)
        + X._rec(X._BOUNDSHEET, struct.pack("<IH", globals_len, 0) + bs_name)
        + sst
        + X._rec(X._EOF, b"")
        + sheet
    )
    back = X.read_sheets(X._cfb_wrap(stream))["s"]
    assert list(back.columns) == ["h1", "h2", "h3"]
    assert list(back.iloc[0]) == [42.0, 42.42, 0.5]


def test_excel_empty_part_dir_clear_error(spark, tmpdir):
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark)
    (tmpdir / "e.xlsx.d").mkdir()
    with pytest.raises(FileNotFoundError, match="no parts"):
        conn.read("e")


def test_excel_sheet_rollover_chunks():
    """Sheet rollover semantics (engine-independent): rows split
    sheet1..sheetN every max_rows; empty frames still get one sheet."""
    import pandas as pd

    from d2d_spark.sources.excel import sheet_chunks

    pdf = pd.DataFrame({"x": range(25)})
    chunks = list(sheet_chunks(pdf, 10))
    assert [name for name, _ in chunks] == ["sheet1", "sheet2", "sheet3"]
    assert [len(c) for _, c in chunks] == [10, 10, 5]
    assert list(chunks[2][1]["x"]) == [20, 21, 22, 23, 24]
    empty = list(sheet_chunks(pdf.iloc[0:0], 10))
    assert len(empty) == 1 and empty[0][0] == "sheet1" and len(empty[0][1]) == 0


def test_elastic_option_assembly(spark):
    from d2d_spark.sources.elastic import ElasticConnector, synthesize_doc_id

    es = ElasticConnector("es1,es2", spark, port=9201, scroll_size=500)
    opts = es.read_options("idx", query_dsl={"query": {"match_all": {}}})
    assert opts["es.nodes"] == "es1,es2" and opts["es.port"] == "9201"
    assert opts["es.scroll.size"] == "500"
    assert '"match_all"' in opts["es.query"]
    w = es.write_options("idx", pks=["a", "b"])
    assert w["es.mapping.id"] == "__es_id"
    rng = es.time_range_query("created_at", gte=100, lte=200)
    assert rng["query"]["bool"]["filter"][0]["range"]["created_at"]["gte"] == 100

    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    ids = {r["__es_id"] for r in synthesize_doc_id(df, ["a", "b"]).collect()}
    assert ids == {"1-x", "2-y"}


def test_mongo_option_assembly(spark):
    from d2d_spark.sources.mongo import MongoConnector, backup_collection_name

    m = MongoConnector("mongodb://h:27017", "db1", spark)
    opts = m.options("coll")
    assert opts == {
        "connection.uri": "mongodb://h:27017",
        "database": "db1",
        "collection": "coll",
    }
    assert backup_collection_name("users", now=0).startswith("users_19")
    with pytest.raises(ValueError):
        m.write(spark.createDataFrame([Row(a=1)]), "c", mode="upsert", pks=["a"])


def test_sqlfile_adversarial_roundtrip(spark, tmpdir):
    """Strings with quotes, backslashes, newlines, tabs, commas,
    parens, unicode, and NULLs must survive render -> parse exactly
    (newlines especially: unescaped they would split statements across
    lines and corrupt the line-based reader)."""
    from d2d_spark.sources import SqlFileConnector

    rows = [
        Row(id=1, s="it's \"fine\""),
        Row(id=2, s="back\\slash and 'quote'"),
        Row(id=3, s="line1\nline2\r\ttab"),
        Row(id=4, s="comma, paren (x), semi;"),
        Row(id=5, s="emoji 🎉 and 中文"),
        Row(id=6, s=None),
        Row(id=7, s="NULL"),  # the string literal, not SQL NULL
        Row(id=8, s="ends with backslash \\"),
    ]
    df = spark.createDataFrame(rows)
    conn = SqlFileConnector(str(tmpdir), spark)
    conn.write(df, "adv", pks=["id"])
    back = conn.read("adv")
    got = {r.id: r.s for r in back.collect()}
    want = {r.id: r.s for r in rows}
    assert got == want


def test_excel_double_column_integral_sample_part(spark, tmpdir):
    """A double column whose sampled part holds only integral values
    must still read parts containing non-integral values (numbers are
    IEEE doubles in SpreadsheetML — no per-cell int collapse)."""
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark)
    df = spark.createDataFrame(
        [Row(k=1, score=2.0), Row(k=2, score=4.0), Row(k=3, score=1.5)]
    ).repartition(3)
    conn.write(df, "d", distributed=True)
    got = sorted((r.k, r.score) for r in conn.read("d").collect())
    assert got == [(1, 2.0), (2, 4.0), (3, 1.5)]


def test_excel_append_accumulates_parts(spark, tmpdir):
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark)
    conn.write(spark.createDataFrame([Row(k=1)]), "t", mode="append", distributed=True)
    conn.write(spark.createDataFrame([Row(k=2)]), "t", mode="append", distributed=True)
    assert sorted(r.k for r in conn.read("t").collect()) == [1, 2]


def test_excel_empty_workbook_reads_empty(spark, tmpdir):
    from d2d_spark.sources.excel import ExcelConnector

    conn = ExcelConnector(str(tmpdir), spark)
    empty = spark.createDataFrame([], "a long, b string")
    conn.write(empty, "e")
    back = conn.read("e")
    assert back.columns == ["a", "b"]
    assert back.count() == 0


def test_excel_duplicate_header_clear_error(spark, tmpdir):
    """A workbook whose header row repeats a name must fail with a
    descriptive ValueError at schema inference, not an opaque
    AttributeError mid-read (pdf[c] on a repeated name returns a
    DataFrame with no .dtype)."""
    import os

    import pandas as pd
    import pytest as _pytest

    from d2d_spark.sources.excel import ExcelConnector
    from d2d_spark.sources.xlsx_lite import write_sheets

    pdf = pd.DataFrame([[1, 2], [3, 4]])
    pdf.columns = ["a", "a"]
    with open(os.path.join(str(tmpdir), "dup.xlsx"), "wb") as f:
        write_sheets([("s", pdf)], f)
    conn = ExcelConnector(str(tmpdir), spark)
    with _pytest.raises(ValueError, match="repeats column name"):
        conn.read("dup")


def test_xlsx_lite_nullable_scalars(tmpdir):
    """pandas nullable dtypes (pd.NA) must serialize as omitted cells,
    not crash."""
    import io

    import pandas as pd

    from d2d_spark.sources.xlsx_lite import read_sheets, write_sheets

    pdf = pd.DataFrame({"a": pd.array([1, None], dtype="Int64"), "b": ["x", None]})
    buf = io.BytesIO()
    write_sheets([("s", pdf)], buf)
    back = read_sheets(buf.getvalue())["s"]
    assert back.iloc[0]["a"] == 1.0 and back.iloc[0]["b"] == "x"
    assert back.iloc[1].isna().all()


def test_restore_swap_debris_glob_metachar_path(spark, sf_dir, tmpdir):
    """Backup restore must work for paths containing glob
    metacharacters."""
    import os

    from d2d_spark.operators.writes import restore_swap_debris, write_mode
    from d2d_spark.session import read_table

    target = str(tmpdir / "t[1]")
    base = read_table(spark, sf_dir, "orders").select("o_orderkey").limit(10)
    write_mode(base, target, mode="overwrite", spark=spark)
    os.replace(target, target + ".__bak_12345678")
    assert restore_swap_debris(spark, target) is True
    assert os.path.exists(target)
