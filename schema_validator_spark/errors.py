"""Error model: codes + exact default message templates.

Parity target: /root/reference/src/error.rs:19-118 (ErrorType variants and the
default code/message per variant).  ``set_message(code, message)`` on a schema
replaces BOTH code and message for every error that schema emits
(error.rs:59-66) while keeping the logical error type.

Violation rows are ``struct<field, code, message, error_type>``; a DataFrame
row passes validation iff its ``violations`` array is empty.  ``error_type``
carries the LOGICAL ``ErrorType`` variant name (Type/Pattern/MinLength/
MaxLength/Literal/Coercion/Missing/Object) and — like the reference's
``ValidationError.error_type`` (error.rs:51-66) — is NOT replaced by
``set_message``, so callers can branch on the logical kind while codes and
messages are customized.
"""

from __future__ import annotations

from dataclasses import dataclass

TYPE_ERROR = "TYPE_ERROR"
PATTERN_ERROR = "PATTERN_ERROR"
MIN_LENGTH_ERROR = "MIN_LENGTH_ERROR"
MAX_LENGTH_ERROR = "MAX_LENGTH_ERROR"
UNKNOWN_FIELD = "UNKNOWN_FIELD"
MISSING_FIELD = "MISSING_FIELD"
LITERAL_ERROR = "LITERAL_ERROR"
COERCION_ERROR = "COERCION_ERROR"
OBJECT_ERROR = "OBJECT_ERROR"
# engine extension (no reference counterpart): row-level cross-field checks
CHECK_ERROR = "CHECK_ERROR"
# engine extension: table-level aggregate quality gates
TABLE_CHECK_ERROR = "TABLE_CHECK_ERROR"


@dataclass(frozen=True)
class ErrorConfig:
    """Custom code+message override (error.rs:14-17)."""

    code: str
    message: str


def type_error_message(expected: str, got: str) -> str:
    # error.rs:68-72
    return f"Type error: expected {expected}, got {got}"


def pattern_error_message(got: str, pattern: str) -> str:
    # error.rs:73-77
    return f"Pattern error: '{got}' does not match pattern '{pattern}'"


def min_length_message(min_len: int, got: int) -> str:
    # error.rs:78-82
    return f"Length error: expected at least {min_len} characters, got {got}"


def max_length_message(max_len: int, got: int) -> str:
    # error.rs:83-87
    return f"Length error: expected at most {max_len} characters, got {got}"


def literal_error_message(expected: str, got: str) -> str:
    # error.rs:98-102 — expected/got are already Debug-formatted strings
    return f"Literal error: expected {expected}, got {got}"


def coercion_error_message(from_t: str, to_t: str) -> str:
    # error.rs:103-107
    return f"Coercion error: cannot convert {from_t} to {to_t}"


def missing_field_message(field: str) -> str:
    # error.rs:108-112
    return f"Missing required field: '{field}'"


def rust_debug(value) -> str:
    """Rust ``{:?}`` formatting for the scalar types the reference recognizes.

    Strings are quoted with backslash escaping (literal.rs:62-63), i64 prints
    plainly, bool prints ``true``/``false``.
    """
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, str):
        escaped = value.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{escaped}"'
    if isinstance(value, float):
        # Rust Debug for f64: 30.0 prints "30.0"
        return repr(value)
    return str(value)
