"""MongoDB connector (MongoDBD, d22d/utils/db/__init__.py:985-1036)
over the mongo-spark-connector DataSource (``mongodb``).

No server/jar in the sandbox: option assembly and the
backup-collection naming rule are the tested logic; ``read``/``write``
raise at format resolution until the connector jar is on the
classpath.

Reference semantics carried over: reads drop the synthetic ``_id``
(:1000-1003); create renames an existing collection to
``<name>_<ts>_bak`` instead of merging (:1018-1024) — surfaced here
as the ``backup_suffix`` naming helper + overwrite-only modes
(the reference supports no keyed dedup on Mongo, README.md:539-540).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from d2d_spark.sources.base import Connector, require_spark

MONGO_FORMAT = "mongodb"


def backup_collection_name(name: str, now: float | None = None) -> str:
    stamp = time.strftime("%Y%m%d%H%M%S", time.localtime(now))
    return f"{name}_{stamp}_bak"


class MongoConnector(Connector):
    def __init__(
        self,
        uri: str,
        database: str,
        spark: SparkSession | None = None,
        batch_size: int = 1000,
        drop_id: bool = True,
    ):
        self.spark = require_spark(spark)
        self.uri = uri
        self.database = database
        self.batch_size = batch_size
        self.drop_id = drop_id

    def options(self, collection: str) -> dict[str, str]:
        return {
            "connection.uri": self.uri,
            "database": self.database,
            "collection": collection,
        }

    def get_indexes(self) -> list[str]:
        raise NotImplementedError("collection listing needs a live server")

    def read(self, index: str, **kw) -> DataFrame:
        reader = self.spark.read.format(MONGO_FORMAT)
        for k, v in self.options(index).items():
            reader = reader.option(k, v)
        df = reader.load()
        return df.drop("_id") if self.drop_id and "_id" in df.columns else df

    def write(self, df: DataFrame, index: str, mode: str = "append", pks=None, **kw) -> None:
        if mode not in ("append", "overwrite"):
            raise ValueError(
                "MongoDB connector supports append/overwrite only "
                "(no keyed dedup — reference parity, README.md:539-540)"
            )
        writer = df.write.format(MONGO_FORMAT).mode(mode)
        for k, v in self.options(index).items():
            writer = writer.option(k, v)
        writer.save()
