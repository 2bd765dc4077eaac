"""Elasticsearch connector (ElasticSearchD/EsModel,
d22d/utils/db/__init__.py:100-274, d22d/utils/db/myutils.py:206-522)
over the ES-Hadoop Spark DataSource (``org.elasticsearch.spark.sql``).

The sandbox has neither an ES server nor the connector jar, so
``read``/``write`` raise cleanly at format resolution; everything
up to that point — option assembly, the query-DSL passthrough, the
synthesized-_id upsert rule — is pure logic, unit-tested, and is the
part that carries the reference's semantics:

- scroll scan        -> connector-internal scroll (es.scroll.size);
- get_data((idx,dsl))-> ``es.query`` passthrough;
- upsert by _id '-'.join(pks) (d22d/utils/db/__init__.py:120-146)
                     -> ``es.mapping.id`` on a synthesized id column.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d2d_spark.sources.base import Connector, require_spark

ES_FORMAT = "org.elasticsearch.spark.sql"


def synthesize_doc_id(df: DataFrame, pks: list[str], id_col: str = "__es_id") -> DataFrame:
    """The reference's _id rule: values of the PK columns joined by
    '-' (stringified). Same key -> same _id -> index op overwrites:
    idempotent bulk upsert."""
    return df.withColumn(
        id_col, F.concat_ws("-", *[F.col(k).cast("string") for k in pks])
    )


class ElasticConnector(Connector):
    def __init__(
        self,
        nodes: str,
        spark: SparkSession | None = None,
        port: int = 9200,
        scroll_size: int = 1000,
        **extra: str,
    ):
        self.spark = require_spark(spark)
        self.conf = {
            "es.nodes": nodes,
            "es.port": str(port),
            "es.scroll.size": str(scroll_size),
            **extra,
        }

    def read_options(self, index: str, query_dsl: dict | str | None = None) -> dict[str, str]:
        opts = dict(self.conf)
        if query_dsl is not None:
            opts["es.query"] = (
                query_dsl if isinstance(query_dsl, str) else json.dumps(query_dsl)
            )
        return opts

    def write_options(self, index: str, pks: list[str] | None, id_col: str = "__es_id") -> dict[str, str]:
        opts = dict(self.conf)
        if pks:
            opts["es.mapping.id"] = id_col
            opts["es.mapping.exclude"] = id_col  # id is metadata, not a field
        return opts

    def time_range_query(self, field: str, gte=None, lte=None) -> dict:
        """_add_time_range (d22d/utils/db/myutils.py:450-459): epoch-
        second range filter DSL."""
        rng = {}
        if gte is not None:
            rng["gte"] = gte
        if lte is not None:
            rng["lte"] = lte
        return {"query": {"bool": {"filter": [{"range": {field: {**rng, "format": "epoch_second"}}}]}}}

    def get_indexes(self) -> list[str]:
        raise NotImplementedError("index listing needs a live cluster")

    def read(self, index: str, query_dsl=None, **kw) -> DataFrame:
        reader = self.spark.read.format(ES_FORMAT)
        for k, v in self.read_options(index, query_dsl).items():
            reader = reader.option(k, v)
        return reader.load(index)

    def write(self, df: DataFrame, index: str, mode: str = "append", pks=None, **kw) -> None:
        if pks:
            df = synthesize_doc_id(df, pks)
            # keyed writes are id-upserts, which ride append semantics —
            # but an EXPLICIT overwrite request still truncates first
            if mode not in ("overwrite",):
                mode = "append"
        writer = df.write.format(ES_FORMAT).mode(mode)
        for k, v in self.write_options(index, pks).items():
            writer = writer.option(k, v)
        writer.save(index)
