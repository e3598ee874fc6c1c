"""Schema system: typed fields with roles, mirroring the reference's
data model re-expressed as Spark StructTypes.

Reference shapes being matched (SURVEY.md §1):
- DataType enum (lintdb/schema/DataTypes.h:29-40): TENSOR, INTEGER,
  FLOAT, TEXT, DATETIME (+ internal QUANTIZED_TENSOR / COLBERT).
- FieldType roles (lintdb/schema/Schema.h:13): Indexed | Context |
  Stored | Colbert — a field may carry several roles.
- Field / FieldParameters (Schema.h:15-51): dimensions, quantization,
  num_centroids, num_iterations, num_subquantizers, nbits.
- Schema persisted as JSON sidecar (lintdb/index.cpp:331-333).

Spark mapping: scalar fields are plain columns (Indexed role = just a
filterable column — Catalyst predicates + parquet stats replace the
reference's per-field inverted index); TENSOR fields are
array<array<float>> token matrices; Colbert fields additionally get
codes (array<bigint>) + residuals (binary) columns, with postings and
mapping side-tables.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field as dc_field
from enum import Enum

from pyspark.sql import types as T


class DataType(str, Enum):
    TENSOR = "tensor"
    INTEGER = "integer"
    FLOAT = "float"
    TEXT = "text"
    DATETIME = "datetime"


class FieldType(str, Enum):
    INDEXED = "indexed"
    STORED = "stored"
    CONTEXT = "context"
    COLBERT = "colbert"


class QuantizerType(str, Enum):
    NONE = "none"
    BINARIZER = "binarizer"
    PRODUCT = "product"
    FLOAT16 = "float16"  # TENSOR_FLOAT16 storage (DataTypes.h:29-40)


@dataclass
class FieldParameters:
    dimensions: int = 0
    quantization: str = QuantizerType.NONE.value
    num_centroids: int = 0
    num_iterations: int = 10
    num_subquantizers: int = 0
    nbits: int = 1
    # 'none' | 'standard' — the reference declares this knob but never
    # implements it (Schema.h:17); 'standard' enables token postings +
    # MatchQuery on TEXT indexed fields.
    analyzer: str = "none"


@dataclass
class Field:
    name: str
    data_type: str
    field_types: list[str] = dc_field(default_factory=list)
    parameters: FieldParameters = dc_field(default_factory=FieldParameters)

    def has_role(self, role: FieldType) -> bool:
        return role.value in self.field_types


def TensorField(name: str, dimensions: int, roles: list[FieldType] | None = None, **params) -> Field:
    roles = roles or [FieldType.COLBERT]
    return Field(
        name,
        DataType.TENSOR.value,
        [r.value for r in roles],
        FieldParameters(dimensions=dimensions, **params),
    )


def IndexedField(name: str, data_type: DataType, analyzer: str = "none") -> Field:
    return Field(
        name,
        data_type.value,
        [FieldType.INDEXED.value],
        FieldParameters(analyzer=analyzer),
    )


def StoredField(name: str, data_type: DataType) -> Field:
    return Field(name, data_type.value, [FieldType.STORED.value])


_SCALAR_SPARK = {
    DataType.INTEGER.value: T.LongType(),
    DataType.FLOAT.value: T.DoubleType(),
    DataType.TEXT.value: T.StringType(),
    DataType.DATETIME.value: T.TimestampType(),
}


@dataclass
class Schema:
    fields: list[Field]

    def __post_init__(self) -> None:
        # a TENSOR field participates in tables only through the
        # COLBERT role; accepting other role combinations would
        # silently drop the field from both doc and ingest schemas
        for f in self.fields:
            if f.data_type == DataType.TENSOR.value and not f.has_role(FieldType.COLBERT):
                raise ValueError(
                    f"tensor field '{f.name}' must carry the colbert role "
                    "(other tensor roles are not supported)"
                )

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"unknown field: {name}")  # DocProcessor.cpp:47-50 behavior

    def colbert_fields(self) -> list[Field]:
        return [f for f in self.fields if f.has_role(FieldType.COLBERT)]

    def scalar_fields(self) -> list[Field]:
        return [f for f in self.fields if f.data_type != DataType.TENSOR.value]

    def analyzed_text_fields(self) -> list[Field]:
        return [
            f
            for f in self.fields
            if f.data_type == DataType.TEXT.value
            and f.has_role(FieldType.INDEXED)
            and f.parameters.analyzer == "standard"
        ]

    def doc_spark_schema(self) -> T.StructType:
        """Schema of the docs (forward) table: tenant, doc_id, scalar
        columns, and per-colbert-field codes/residuals/num_tokens."""
        cols = [
            T.StructField("tenant", T.LongType(), False),
            T.StructField("doc_id", T.LongType(), False),
        ]
        for f in self.scalar_fields():
            cols.append(T.StructField(f.name, _SCALAR_SPARK[f.data_type], True))
        for f in self.colbert_fields():
            cols.append(T.StructField(f"{f.name}__codes", T.ArrayType(T.LongType()), True))
            cols.append(T.StructField(f"{f.name}__residuals", T.BinaryType(), True))
            cols.append(T.StructField(f"{f.name}__num_tokens", T.IntegerType(), True))
        return T.StructType(cols)

    def ingest_spark_schema(self) -> T.StructType:
        """Schema expected of user ingest DataFrames: tenant, doc_id,
        scalars, and raw token matrices for tensor fields."""
        cols = [
            T.StructField("tenant", T.LongType(), False),
            T.StructField("doc_id", T.LongType(), False),
        ]
        for f in self.scalar_fields():
            cols.append(T.StructField(f.name, _SCALAR_SPARK[f.data_type], True))
        for f in self.colbert_fields():
            cols.append(
                T.StructField(f.name, T.ArrayType(T.ArrayType(T.FloatType())), True)
            )
        return T.StructType(cols)

    def to_json(self) -> str:
        return json.dumps({"fields": [asdict(f) for f in self.fields]}, indent=2)

    @classmethod
    def from_json(cls, s: str) -> Schema:
        raw = json.loads(s)
        fields = [
            Field(
                f["name"],
                f["data_type"],
                list(f.get("field_types", [])),
                FieldParameters(**f.get("parameters", {})),
            )
            for f in raw["fields"]
        ]
        return cls(fields)
