"""Fluent, Zod-style schema builder — the declarative front end of the engine.

Parity target: /root/reference/src/lib.rs:291-528 (``schema()`` →
``SchemaBuilder`` / ``CoerceBuilder``), src/schema/string.rs (StringSchema +
TransformedSchema), number.rs, boolean.rs, object.rs, optional.rs, literal.rs.

The builder produces a pure declaration; ``plans.compile`` turns it into a
single-pass DataFrame projection (value columns + violation columns).  Nothing
here touches Spark — schemas are cheap, picklable descriptions.

Semantic quirk replicated from the reference (string.rs:251-283): once a string
schema has ANY transform in its chain, validation becomes
``type/coerce → all transforms → pattern only`` — min_length/max_length are
silently dropped.  See ``StringSchema.has_transforms``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from .errors import ErrorConfig
from .functions.patterns import BUILTIN_CONFIGS


class BaseSchema:
    """Shared bits: coerce flag, custom error config, optional wrapper."""

    kind: str = "base"

    def __init__(self, coerce: bool = False):
        self.coerce = coerce
        self.error_config: Optional[ErrorConfig] = None
        self.nullable = False
        # transforms attached AFTER .optional() — Option<T> → U semantics
        # (optional.rs:36-47): the callable receives None for NULL inputs.
        self.opt_transforms: list = []
        # table-level constraints (engine extensions, SURVEY.md §2.B)
        self.unique_constraint = False
        self.unique_skew_salt = 0

    def set_message(self, code: str, message: str):
        """Override code+message for every error this schema emits
        (error.rs:59-66; e.g. string.rs:321-331)."""
        self.error_config = ErrorConfig(code, message)
        return self

    def optional(self):
        """Accept NULL (→ NULL output, no violation); otherwise validate the
        inner schema (optional.rs:65-98, mod.rs:92-97)."""
        self.nullable = True
        return self

    def unique(self, skew_salt: int = 0):
        """Table-level uniqueness constraint on this field (engine extension —
        per-value uniqueness has no meaning in the reference; SURVEY.md §2.B).
        Compiled by ``ValidationPlan.table_violations`` into a hash-agg dedup;
        ``skew_salt > 0`` switches to the two-phase salted aggregation for
        heavy-tail keys (e.g. url hosts)."""
        self.unique_constraint = True
        self.unique_skew_salt = skew_salt
        return self


@dataclass
class Transform:
    """One step of a transform chain.

    ``name`` is a built-in ('trim', 'lower', 'upper') compiled to native JVM
    expressions, or 'custom' carrying a Python callable that is fused with its
    neighbours into a single Arrow-vectorized pandas UDF stage.
    """

    name: str
    fn: Optional[Callable] = None
    return_type: str = "string"  # Spark DDL type of the output


class StringSchema(BaseSchema):
    """string.rs:286-303 — coerce, pattern, min/max length, transforms."""

    kind = "string"

    def __init__(self, coerce: bool = False):
        super().__init__(coerce)
        self.pattern_regex: Optional[str] = None
        self.min_len: Optional[int] = None
        self.max_len: Optional[int] = None
        self.transforms: list[Transform] = []

    # -- checks ---------------------------------------------------------
    def pattern(self, regex: str):
        """string.rs:352-355. Regex must be dialect-neutral (documented) —
        evaluated via Java regex (`rlike`) JVM-side.

        The reference panics at schema build time on an invalid pattern
        (string.rs:353, ``Regex::new(..).unwrap()``); we raise a clear
        ``ValueError`` here instead of a runtime executor failure.
        """
        import re as _re

        try:
            _re.compile(regex)
        except _re.error as exc:
            raise ValueError(f"invalid regex pattern {regex!r}: {exc}") from None
        self.pattern_regex = regex
        return self

    def min_length(self, n: int):
        """Byte length ≥ n (Rust String::len is bytes; string.rs:574-577)."""
        self.min_len = n
        return self

    def max_length(self, n: int):
        self.max_len = n
        return self

    # -- built-in patterns (string.rs:370-553) --------------------------
    def _builtin(self, name: str):
        regex, code, message = BUILTIN_CONFIGS[name]
        self.pattern_regex = regex
        self.error_config = ErrorConfig(code, message)
        return self

    def email(self):
        return self._builtin("email")

    def url(self):
        return self._builtin("url")

    def date(self):
        return self._builtin("date")

    def time(self):
        return self._builtin("time")

    def uuid(self):
        return self._builtin("uuid")

    def ipv4(self):
        return self._builtin("ipv4")

    def phone(self):
        return self._builtin("phone")

    def username(self):
        return self._builtin("username")

    def password(self):
        return self._builtin("password")

    # -- transforms (string.rs:621-698) ---------------------------------
    @property
    def has_transforms(self) -> bool:
        return bool(self.transforms)

    def trim(self):
        """Unicode-whitespace trim both ends (string.rs:646-648)."""
        self.transforms.append(Transform("trim"))
        return self

    def to_lowercase(self):
        self.transforms.append(Transform("lower"))
        return self

    def to_uppercase(self):
        self.transforms.append(Transform("upper"))
        return self

    def transform(self, fn: Callable[[Any], Any], return_type: str = "string"):
        """Arbitrary transform — compiled into a fused pandas UDF stage
        (Arrow-vectorized Series→Series; never per-row Python).

        Called after ``.optional()`` this becomes an Option-mapping transform:
        ``fn`` receives ``None`` for NULL inputs (optional.rs:36-47)."""
        if self.nullable:
            self.opt_transforms.append(Transform("custom", fn, return_type))
        else:
            self.transforms.append(Transform("custom", fn, return_type))
        return self

    @property
    def inner_output_type(self) -> str:
        """Output type before any optional-transform stage."""
        for t in reversed(self.transforms):
            if t.name == "custom":
                return t.return_type
        return "string"

    @property
    def output_type(self) -> str:
        for t in reversed(self.opt_transforms):
            if t.name == "custom":
                return t.return_type
        return self.inner_output_type


class NumberSchema(BaseSchema):
    """number.rs:7-109 — f64 semantics; coercion from i64/string/bool."""

    kind = "number"

    def __init__(self, coerce: bool = False):
        super().__init__(coerce)
        self.transforms: list[Transform] = []

    def transform(self, fn: Callable[[float], float], return_type: str = "double"):
        """f64→f64 pipeline applied after validation (number.rs:44-57, 99).
        After ``.optional()``: Option<f64> → U (optional.rs:36-47)."""
        if self.nullable:
            self.opt_transforms.append(Transform("custom", fn, return_type))
        else:
            self.transforms.append(Transform("custom", fn, "double"))
        return self

    @property
    def output_type(self) -> str:
        for t in reversed(self.opt_transforms):
            if t.name == "custom":
                return t.return_type
        return "double"


class BooleanSchema(BaseSchema):
    """boolean.rs:7-111 — bool semantics; JS-style truthiness coercion."""

    kind = "boolean"

    def __init__(self, coerce: bool = False):
        super().__init__(coerce)
        self.transforms: list[Transform] = []

    def transform(self, fn: Callable[[bool], bool], return_type: str = "boolean"):
        if self.nullable:
            self.opt_transforms.append(Transform("custom", fn, return_type))
        else:
            self.transforms.append(Transform("custom", fn, "boolean"))
        return self

    @property
    def output_type(self) -> str:
        for t in reversed(self.opt_transforms):
            if t.name == "custom":
                return t.return_type
        return "boolean"


class LiteralSchema(BaseSchema):
    """literal.rs:7-80 — strict type check then equality; both failures are
    LITERAL_ERROR with Rust Debug-formatted expected/got."""

    kind = "literal"

    def __init__(self, value):
        super().__init__(coerce=False)
        if not isinstance(value, (str, bool, int, float)):
            raise TypeError(f"literal() supports str/i64/f64/bool, got {type(value)}")
        self.value = value

    @property
    def output_type(self) -> str:
        if isinstance(self.value, bool):
            return "boolean"
        if isinstance(self.value, str):
            return "string"
        if isinstance(self.value, float):
            return "double"
        return "bigint"


class ObjectSchema(BaseSchema):
    """object.rs:79-392 — named field schemas over a flat row.

    Validation accumulates ALL field errors (no cross-field short-circuit,
    object.rs:288-306); extra input columns are silently ignored
    (object.rs:269); a schema field absent from the DataFrame is a Missing
    violation using the object-level error config (object.rs:297-305).
    """

    kind = "object"

    def __init__(self):
        super().__init__(coerce=False)
        self.fields: dict[str, BaseSchema] = {}
        # field → (dim_name, dim_key, strategy): referential constraints
        # resolved against DataFrames supplied at run time (SURVEY.md §2.B)
        self.references: dict[str, tuple] = {}
        # object-level post-validation transform (TransformedObjectSchema,
        # object.rs:189-199, 319-332): HashMap<String, Box<dyn Any>> -> T
        self.obj_transform: Optional[Transform] = None
        self.obj_transform_mode: str = "row"
        # row-level cross-field checks: (name, predicate, code, message)
        self.checks: list = []
        # table-level aggregate checks: (name, predicate, metric, code, message)
        self.table_checks: list = []

    def field(self, name: str, schema: BaseSchema):
        self.fields[name] = schema
        return self

    def transform(self, fn: Callable, return_type: str = "string", mode: str = "row"):
        """Object-level transform — the analog of ``TransformedObjectSchema``
        (object.rs:189-199, 319-332; doc example object.rs:176-188): after the
        whole object validates, map the validated field map to a value ``T``.

        ``mode`` picks the execution shape (``plans.runner.validate_transformed``):

        - ``"column"`` — ``fn(fields: dict[str, Column]) -> Column``: a native
          struct/expression projection fused into the validation select
          (whole-stage codegen, zero Python) — preferred when the mapping is
          expressible as Spark expressions.
        - ``"pandas"`` — ``fn(pd.DataFrame) -> pd.Series | pd.DataFrame``:
          Arrow-vectorized over batches of validated rows.
        - ``"row"`` — ``fn(dict) -> value``: the literal reference shape
          (closure over one HashMap); executed inside an Arrow-batched pandas
          UDF, per-row Python confined to the user's own callable exactly as
          in the reference.
        """
        if mode not in ("row", "pandas", "column"):
            raise ValueError(f"unknown object transform mode {mode!r}")
        self.obj_transform = Transform("custom", fn, return_type)
        self.obj_transform_mode = mode
        return self

    def check(self, name: str, predicate, message: "str | None" = None, code: "str | None" = None):
        """Row-level CROSS-FIELD check — an engine extension with no
        reference counterpart (the reference validates one value at a time;
        a dbt-test/Deequ-style invariant lives naturally at the engine's
        table layer).

        ``predicate``: a Spark ``Column`` or SQL expression string over the
        INPUT columns (evaluated inside the same single validation
        projection — zero extra passes).  SQL CHECK semantics: a NULL
        predicate counts as PASS, so checks constrain only what they can
        see.  A failing check contributes a violation struct
        ``(field=name, code, message, error_type='Check')`` and flips
        ``valid`` exactly like a field violation."""
        from .errors import CHECK_ERROR

        self.checks.append(
            (
                name,
                predicate,
                code or CHECK_ERROR,
                message or f"Check failed: '{name}'",
            )
        )
        return self

    def table_check(
        self,
        name: str,
        predicate,
        metric=None,
        message: "str | None" = None,
        code: "str | None" = None,
    ):
        """TABLE-level aggregate check (Deequ/dbt-style quality gate):
        ``predicate`` is a boolean AGGREGATE expression over the whole table
        (Column or SQL string), e.g. ``F.count(F.lit(1)) >= 1000`` or
        ``"avg(n_chars) between 100 and 1000"``.  ``metric`` (optional
        aggregate expression) is rendered into the violation's key so the
        failing value is visible.  All declared table checks evaluate in ONE
        aggregation job (``ValidationPlan.table_violations``); a NULL
        predicate (e.g. avg of an all-null column) counts as FAIL — an
        unverifiable gate must not silently pass."""
        self.table_checks.append((name, predicate, metric, code, message))
        return self

    def ref(self, field: str, dim_name: str, dim_key: str, strategy: str = "broadcast"):
        """Declare a referential-integrity constraint: ``field`` must exist in
        dimension ``dim_name``'s ``dim_key`` column.  The dimension DataFrame
        itself is supplied to ``ValidationPlan.table_violations(dims=...)`` —
        schemas stay pure declarations.  ``strategy``: broadcast (no shuffle
        of the fact side) / shuffle_hash / auto."""
        self.references[field] = (dim_name, dim_key, strategy)
        return self

    def result_type(self):
        """StructType of the validated output — the analog of
        ``validate_as::<T>`` / #[derive(Validate)] (object.rs:381-392)."""
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        return StructType(
            [
                StructField(n, _parse_datatype_string(getattr(s, "output_type", "string")), True)
                for n, s in self.fields.items()
            ]
        )


class SchemaFactory:
    """``schema()`` entry point (lib.rs:526-528, SchemaBuilder lib.rs:291-294)."""

    def __init__(self, coerce: bool = False):
        self._coerce = coerce

    def string(self) -> StringSchema:
        return StringSchema(self._coerce)

    def number(self) -> NumberSchema:
        return NumberSchema(self._coerce)

    def boolean(self) -> BooleanSchema:
        return BooleanSchema(self._coerce)

    def object(self) -> ObjectSchema:
        return ObjectSchema()

    def literal(self, value) -> LiteralSchema:
        return LiteralSchema(value)

    def coerce(self) -> "SchemaFactory":
        """lib.rs:472-505 — same constructors with coercion enabled."""
        return SchemaFactory(coerce=True)


def schema() -> SchemaFactory:
    return SchemaFactory()
