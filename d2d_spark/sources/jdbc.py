"""JDBC connector — MySQL/PostgreSQL/ClickHouse/Oracle behind one
interface (the reference's MySqlD :362-474, BaseDB/PG myutils.py:
755-1050, ClickHouseD :1257-1466, OracleD :1501-1596 collapse into
Spark's JDBC DataSource; engine differences shrink to a dialect
string and a DDL ladder).

Scale posture is explicit: an unpartitioned JDBC read is ONE task no
matter the cluster — ``partition_column``+``num_partitions`` (or
``predicates``) is required above ``SINGLE_TASK_ROW_LIMIT`` rows, the
config-level analog of the reference's streaming cursors. Writes use
``batchsize`` (the reference's executemany window) and
``createTableColumnTypes`` from the shared DDL ladder.

No database server exists in the sandbox; everything up to the actual
connection is importable and unit-tested (option assembly, DDL,
partitioning math), and the connect path raises cleanly without a
driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from d2d_spark.sources.base import Connector, require_spark
from d2d_spark.sources.ddl import create_table_sql, jdbc_column_types

#: above this, refuse to scan without read parallelism configured
SINGLE_TASK_ROW_LIMIT = 10_000_000


class JdbcConnector(Connector):
    def __init__(
        self,
        url: str,
        spark: SparkSession | None = None,
        user: str | None = None,
        password: str | None = None,
        driver: str | None = None,
        fetchsize: int = 10_000,
        batchsize: int = 1_000,
    ):
        self.url = url
        self.spark = require_spark(spark)
        self.props = {k: v for k, v in {"user": user, "password": password, "driver": driver}.items() if v}
        self.fetchsize = fetchsize
        self.batchsize = batchsize
        self.dialect = url_dialect(url)

    # -- option assembly (unit-testable without a server) --------------
    def read_options(
        self,
        index: str,
        condition: str | None = None,
        partition_column: str | None = None,
        num_partitions: int | None = None,
        lower_bound=None,
        upper_bound=None,
    ) -> dict[str, str]:
        """`condition` reproduces the reference's WHERE-suffix kwarg
        (d22d/utils/db/__init__.py:374) — as a pushed-down dbtable
        subquery, so the remote engine filters before shipping rows."""
        table = index if not condition else f"(SELECT * FROM {index} WHERE {condition}) AS __src"
        opts = {"url": self.url, "dbtable": table, "fetchsize": str(self.fetchsize), **self.props}
        if partition_column:
            if num_partitions is None or lower_bound is None or upper_bound is None:
                raise ValueError("partition_column needs num_partitions + bounds")
            opts.update(
                partitionColumn=partition_column,
                numPartitions=str(num_partitions),
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
            )
        return opts

    def read(self, index: str, **kw) -> DataFrame:
        reader = self.spark.read.format("jdbc")
        for k, v in self.read_options(index, **kw).items():
            reader = reader.option(k, v)
        return reader.load()

    def read_query(self, sql: str, **kw) -> DataFrame:
        """Raw-SQL passthrough (MySqlD.get_data('select …'),
        d22d/utils/db/__init__.py:373-378): the statement executes on
        the remote engine; Spark plans around the result."""
        reader = (
            self.spark.read.format("jdbc").option("url", self.url).option("query", sql)
        )
        for k, v in self.props.items():
            reader = reader.option(k, v)
        return reader.load()

    def get_indexes(self) -> list[str]:
        raise NotImplementedError("catalog listing needs a live connection")

    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "append",
        pks: list[str] | None = None,
        **kw,
    ) -> None:
        """append/overwrite map straight to the JDBC writer.
        ignore/replace/upsert need engine-side key semantics: stage to
        a temp table, then issue the INSERT IGNORE / REPLACE / ON
        DUPLICATE KEY UPDATE … SELECT from :func:`staged_merge_sql`
        on the engine (one statement moves the whole batch, like the
        reference's mode-selected executemany) and drop the stage."""
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", index if mode in ("append", "overwrite") else f"{index}__stage")
            .option("batchsize", str(self.batchsize))
            .option("createTableColumnTypes", jdbc_column_types(df.schema, pks, self.dialect))
        )
        for k, v in self.props.items():
            writer = writer.option(k, v)
        # the stage table is OVERWRITTEN, never appended: a crash after
        # a previous load (before its DROP TABLE) must not leak stale
        # rows into this batch's merge
        writer.mode("overwrite" if mode not in ("append",) else mode).save()
        if mode not in ("append", "overwrite"):
            # bootstrap the target WITH its primary key before the
            # first merge (reference auto-DDL marks PKs, __init__.py:
            # 437-474) — the JDBC writer would otherwise never create
            # it, or create it keyless
            stmts = [create_table_sql(index, df.schema, pks, self.dialect)]
            stmts += staged_merge_sql(index, df.columns, mode, self.dialect, pks)
            self.execute_statements(stmts)

    def execute_statements(self, statements: list[str]) -> None:
        """Run engine-side SQL over the same JDBC url (py4j
        DriverManager — the path Spark's own writer uses)."""
        jvm = self.spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(
            self.url, self.props.get("user", ""), self.props.get("password", "")
        )
        try:
            stmt = conn.createStatement()
            try:
                for sql in statements:
                    stmt.execute(sql)
            finally:
                stmt.close()
        finally:
            conn.close()


def url_dialect(url: str) -> str:
    """jdbc:<engine>:… -> dialect key; unknown engines get the MySQL
    grammar (the reference's default engine)."""
    engine = url.split(":")[1].lower() if url.count(":") >= 2 else ""
    if engine in ("postgresql", "postgres"):
        return "postgresql"
    if engine == "clickhouse":
        return "clickhouse"
    if engine == "oracle":
        return "oracle"
    return "mysql"


def staged_merge_sql(
    index: str,
    columns: list[str],
    mode: str,
    dialect: str = "mysql",
    pks: list[str] | None = None,
) -> list[str]:
    """Engine-side statements completing an ignore/replace/upsert
    write after the stage table is loaded (single network round-trip
    per batch-load, like the reference's mode-selected executemany).

    Per dialect (reference claims all four engines — MySqlD
    __init__.py:362-474, PG myutils.py:755-1050, ClickHouse
    :1257-1466, Oracle :1501-1596):
      mysql       INSERT IGNORE / REPLACE / ON DUPLICATE KEY UPDATE —
                  the engine's own unique key arbitrates, pks unused
      postgresql  INSERT … ON CONFLICT (pks) DO NOTHING / DO UPDATE
                  SET c = EXCLUDED.c — conflict target REQUIRES pks
      clickhouse  no unique constraints: ignore = anti-join insert,
                  replace/upsert = lightweight DELETE matching keys
                  then insert — REQUIRES pks
      oracle      MERGE INTO … USING stage — REQUIRES pks
    """
    if mode not in ("ignore", "replace", "upsert"):
        raise ValueError(f"unknown staged mode {mode!r}")
    if dialect != "mysql" and not pks:
        raise ValueError(f"{dialect} staged merge needs pks (no engine-side key to fall back on)")
    q = "`" if dialect in ("mysql", "clickhouse") else '"'
    collist = ", ".join(f"{q}{c}{q}" for c in columns)
    stage = f"{index}__stage"
    drop = f"DROP TABLE {q}{stage}{q}"
    non_pk = [c for c in columns if c not in (pks or [])]

    if dialect == "mysql":
        if mode == "ignore":
            head = f"INSERT IGNORE INTO {q}{index}{q} ({collist})"
        elif mode == "replace":
            head = f"REPLACE INTO {q}{index}{q} ({collist})"
        else:
            sets = ", ".join(f"{q}{c}{q}=VALUES({q}{c}{q})" for c in columns)
            return [
                f"INSERT INTO {q}{index}{q} ({collist}) SELECT {collist} FROM {q}{stage}{q}"
                f" ON DUPLICATE KEY UPDATE {sets}",
                drop,
            ]
        return [f"{head} SELECT {collist} FROM {q}{stage}{q}", drop]

    if dialect == "postgresql":
        keylist = ", ".join(f"{q}{k}{q}" for k in pks)
        head = f'INSERT INTO {q}{index}{q} ({collist}) SELECT {collist} FROM {q}{stage}{q}'
        if mode == "ignore" or not non_pk:
            return [f"{head} ON CONFLICT ({keylist}) DO NOTHING", drop]
        sets = ", ".join(f'{q}{c}{q} = EXCLUDED.{q}{c}{q}' for c in non_pk)
        return [f"{head} ON CONFLICT ({keylist}) DO UPDATE SET {sets}", drop]

    if dialect == "clickhouse":
        on = " AND ".join(f"s.{q}{k}{q} = t.{q}{k}{q}" for k in pks)
        sel = ", ".join(f"s.{q}{c}{q}" for c in columns)
        if mode == "ignore":
            return [
                f"INSERT INTO {q}{index}{q} ({collist}) SELECT {sel} FROM {q}{stage}{q} AS s"
                f" LEFT ANTI JOIN {q}{index}{q} AS t ON {on}",
                drop,
            ]
        keytuple = ", ".join(f"{q}{k}{q}" for k in pks)
        return [
            f"DELETE FROM {q}{index}{q} WHERE ({keytuple}) IN"
            f" (SELECT {keytuple} FROM {q}{stage}{q})",
            f"INSERT INTO {q}{index}{q} ({collist}) SELECT {collist} FROM {q}{stage}{q}",
            drop,
        ]

    # oracle: one MERGE covers both modes
    on = " AND ".join(f't."{k}" = s."{k}"' for k in pks)
    ins_cols = ", ".join(f'"{c}"' for c in columns)
    ins_vals = ", ".join(f's."{c}"' for c in columns)
    merge = f'MERGE INTO "{index}" t USING "{stage}" s ON ({on})'
    if mode in ("replace", "upsert") and non_pk:
        sets = ", ".join(f't."{c}" = s."{c}"' for c in non_pk)
        merge += f" WHEN MATCHED THEN UPDATE SET {sets}"
    merge += f" WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    return [merge, drop]
