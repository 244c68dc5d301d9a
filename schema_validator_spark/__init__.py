"""schema_validator_spark — a PySpark-native constraint-validation engine.

Re-expresses the declarative, Zod-style validation semantics of the reference
Rust library ``fullgream/schema_validator`` (see SURVEY.md) as DataFrame-
compiled constraint plans: fluent schemas compile to single-pass Spark
projections producing transformed values, violation rows, and per-partition
verdicts — plus table-level operators (column stats, uniqueness, referential,
drift, dedup, similarity) the reference's single-value model cannot express.
"""

from .errors import ErrorConfig
from .plans.json import validate_json_objects
from .plans.runner import ValidationPlan, validate_column
from .schema import (
    BooleanSchema,
    LiteralSchema,
    NumberSchema,
    ObjectSchema,
    SchemaFactory,
    StringSchema,
    schema,
)

__all__ = [
    "schema",
    "SchemaFactory",
    "StringSchema",
    "NumberSchema",
    "BooleanSchema",
    "LiteralSchema",
    "ObjectSchema",
    "ErrorConfig",
    "ValidationPlan",
    "validate_column",
    "validate_json_objects",
]

__version__ = "0.1.0"
