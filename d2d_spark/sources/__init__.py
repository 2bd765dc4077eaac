"""Connector layer — SURVEY.md §2.1's table contract on Spark."""

from d2d_spark.sources.base import Connector, Sink, Source, WRITE_MODES
from d2d_spark.sources.files import (
    AvroConnector,
    CsvConnector,
    FileConnector,
    JsonlConnector,
    OrcConnector,
    ParquetConnector,
    TxtConnector,
)
from d2d_spark.sources.memory import MemoryConnector, kv_pairs
from d2d_spark.sources.sqlfile import SqlFileConnector, read_sql_dump, render_sql_statements
from d2d_spark.sources.archive import read_rar, read_zip
from d2d_spark.sources.blobstore import BlobStore
from d2d_spark.sources.jdbc import JdbcConnector, staged_merge_sql
from d2d_spark.sources.excel import ExcelConnector, XlsConnector
from d2d_spark.sources.elastic import ElasticConnector, synthesize_doc_id
from d2d_spark.sources.mongo import MongoConnector, backup_collection_name

__all__ = [
    "WRITE_MODES",
    "Connector",
    "Sink",
    "Source",
    "FileConnector",
    "CsvConnector",
    "TxtConnector",
    "JsonlConnector",
    "OrcConnector",
    "AvroConnector",
    "ParquetConnector",
    "MemoryConnector",
    "kv_pairs",
    "SqlFileConnector",
    "read_sql_dump",
    "render_sql_statements",
    "read_zip",
    "read_rar",
    "BlobStore",
    "JdbcConnector",
    "staged_merge_sql",
    "ExcelConnector",
    "XlsConnector",
    "ElasticConnector",
    "synthesize_doc_id",
    "MongoConnector",
    "backup_collection_name",
]
