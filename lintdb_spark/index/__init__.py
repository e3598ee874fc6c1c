from lintdb_spark.index.schema import (
    DataType,
    Field,
    FieldParameters,
    FieldType,
    Schema,
)
from lintdb_spark.index.query import (
    AndQuery,
    MatchQuery,
    OrQuery,
    SearchOptions,
    TermQuery,
    VectorQuery,
)
from lintdb_spark.index.index import Index

__all__ = [
    "DataType",
    "Field",
    "FieldParameters",
    "FieldType",
    "Schema",
    "TermQuery",
    "VectorQuery",
    "MatchQuery",
    "AndQuery",
    "OrQuery",
    "SearchOptions",
    "Index",
]
