"""Parity ports of reference tests: validation/mod.rs, coercion/mod.rs,
transform/mod.rs, error/mod.rs, literal.rs."""

from __future__ import annotations

import math

from pyspark.sql import types as T

from schema_validator_spark import schema

from helpers import assert_err, assert_ok, run_cases, run_one


# -- tests/validation/mod.rs ------------------------------------------------

def test_type_validation(spark):
    s = schema()
    assert_ok(run_one(spark, s.string(), "user@example.com"), "user@example.com")
    assert_err(run_one(spark, s.string(), 25.0), "TYPE_ERROR")
    assert_ok(run_one(spark, s.number(), 25.0), 25.0)
    assert_err(run_one(spark, s.number(), "user@example.com"), "TYPE_ERROR")
    assert_ok(run_one(spark, s.boolean(), True), True)
    assert_err(run_one(spark, s.boolean(), 25.0), "TYPE_ERROR")


# -- tests/coercion/mod.rs ---------------------------------------------------

def test_number_coercion(spark):
    s = schema()
    assert_ok(run_one(spark, s.coerce().number(), "42"), 42.0)
    assert_ok(run_one(spark, s.coerce().number(), "42.5"), 42.5)
    assert_ok(run_one(spark, s.coerce().number(), True), 1.0)
    assert_ok(run_one(spark, s.coerce().number(), False), 0.0)
    assert_err(
        run_one(spark, s.coerce().number(), "not a number"),
        "COERCION_ERROR",
        "Coercion error: cannot convert String to Number",
    )
    # Rust str::parse::<f64> quirks: whitespace rejected, inf/nan accepted
    r = run_cases(spark, s.coerce().number(), [" 42", "42 ", "", "inf", "NaN", "1e3"])
    assert_err(r[0], "COERCION_ERROR")
    assert_err(r[1], "COERCION_ERROR")
    assert_err(r[2], "COERCION_ERROR")
    assert r[3][0] == float("inf") and r[3][1] is None
    assert math.isnan(r[4][0]) and r[4][1] is None
    assert r[5][0] == 1000.0 and r[5][1] is None


def test_boolean_coercion_truthiness(spark):
    # tests/coercion/mod.rs:44-82 — JS-style truthiness table
    s = schema()
    sch = s.coerce().boolean()
    r = run_cases(spark, sch, ["tuna", "true", "false", ""])
    assert [x[0] for x in r] == [True, True, True, False]
    r = run_cases(spark, sch, [1, -1, 0])
    assert [x[0] for x in r] == [True, True, False]
    r = run_cases(spark, sch, [1.0, -1.0, 0.0])
    assert [x[0] for x in r] == [True, True, False]
    # arrays: non-empty truthy, empty falsy
    r = run_cases(
        spark, sch, [[True], []], spark_type=T.ArrayType(T.BooleanType())
    )
    assert [x[0] for x in r] == [True, False]
    r = run_cases(spark, sch, [["hello"], []], spark_type=T.ArrayType(T.StringType()))
    assert [x[0] for x in r] == [True, False]
    # None → false (boolean.rs:74-75)
    assert_ok(run_one(spark, sch, None, spark_type=T.BooleanType()), False)


# -- tests/transform/mod.rs ---------------------------------------------------

def test_string_transform(spark):
    s = schema()
    sch = s.string().transform(lambda v: v.strip())
    assert_ok(run_one(spark, sch, "  hello  "), "hello")

    sch = s.string().transform(lambda v: v.strip()).transform(lambda v: v.upper())
    assert_ok(run_one(spark, sch, "  hello  "), "HELLO")

    # transform with coercion, string → double output
    sch = (
        schema().coerce().string()
        .transform(lambda v: 1.0 if "42" in v else 0.0, return_type="double")
    )
    assert_ok(run_one(spark, sch, "42"), 1.0)

    # number coerced to string then identity-ish transform
    sch = schema().coerce().string().transform(lambda v: str(v))
    assert_ok(run_one(spark, sch, 42), "42")


def test_number_transform(spark):
    s = schema()
    # Rust f64::round = half away from zero
    rust_round = lambda n: math.floor(n + 0.5) if n >= 0 else math.ceil(n - 0.5)
    sch = s.number().transform(rust_round)
    assert_ok(run_one(spark, sch, 3.7), 4.0)

    sch = s.number().transform(lambda n: n * 2.0).transform(rust_round)
    assert_ok(run_one(spark, sch, 3.7), 7.0)


def test_boolean_transform(spark):
    s = schema()
    assert_ok(run_one(spark, s.boolean().transform(lambda b: not b), True), False)
    sch = s.boolean().transform(lambda b: not b).transform(lambda b: not b)
    assert_ok(run_one(spark, sch, True), True)


# -- tests/error/mod.rs --------------------------------------------------------

def test_default_errors(spark):
    s = schema()
    assert_err(
        run_one(spark, s.string(), 42.0),
        "TYPE_ERROR",
        message_contains="expected String",
    )
    assert_err(
        run_one(spark, s.coerce().number(), "invalid"),
        "COERCION_ERROR",
        message_contains="cannot convert String to Number",
    )


def test_custom_error_messages(spark):
    s = schema()
    sch = s.string().set_message("INVALID_TYPE", "Must be a string value")
    assert_err(run_one(spark, sch, 42.0), "INVALID_TYPE", "Must be a string value")

    sch = s.coerce().number().set_message("INVALID_NUMBER", "Cannot convert to number")
    assert_err(
        run_one(spark, sch, "invalid"), "INVALID_NUMBER", "Cannot convert to number"
    )


def test_error_with_transform(spark):
    # error/mod.rs:40-51 — type error BEFORE transform still uses custom message
    s = schema()
    sch = (
        s.string()
        .transform(lambda v: v.upper())
        .set_message("INVALID", "Invalid value")
    )
    assert_err(run_one(spark, sch, 42.0), "INVALID", "Invalid value")


# -- tests/literal.rs -----------------------------------------------------------

def test_string_literal(spark):
    s = schema()
    sch = s.literal("tuna")
    assert_ok(run_one(spark, sch, "tuna"), "tuna")
    assert_err(run_one(spark, sch, "salmon"))

    sch = s.literal("tuna").set_message("INVALID_FISH", "Only tuna is allowed")
    assert_err(run_one(spark, sch, "salmon"), "INVALID_FISH", "Only tuna is allowed")
    # wrong type also uses custom message
    assert_err(run_one(spark, sch, 42), "INVALID_FISH", "Only tuna is allowed")


def test_number_literal(spark):
    s = schema()
    sch = s.literal(42)
    assert_ok(run_one(spark, sch, 42), 42)
    assert_err(run_one(spark, sch, 43))

    sch = s.literal(42).set_message("INVALID_NUMBER", "Value must be 42")
    assert_err(run_one(spark, sch, 43), "INVALID_NUMBER", "Value must be 42")
    assert_err(run_one(spark, sch, "42"), "INVALID_NUMBER", "Value must be 42")


def test_boolean_literal(spark):
    s = schema()
    sch = s.literal(True)
    assert_ok(run_one(spark, sch, True), True)
    assert_err(run_one(spark, sch, False))

    sch = s.literal(True).set_message("INVALID_BOOL", "Value must be true")
    assert_err(run_one(spark, sch, False), "INVALID_BOOL", "Value must be true")
    assert_err(run_one(spark, sch, "true"), "INVALID_BOOL", "Value must be true")


def test_literal_error_messages(spark):
    # tests/literal.rs:73-94 — Rust {:?} Debug quoting in default messages
    s = schema()
    assert_err(
        run_one(spark, s.literal("tuna"), "salmon"),
        "LITERAL_ERROR",
        'Literal error: expected "tuna", got "salmon"',
    )
    assert_err(
        run_one(spark, s.literal(42), 43),
        "LITERAL_ERROR",
        "Literal error: expected 42, got 43",
    )
    assert_err(
        run_one(spark, s.literal(True), False),
        "LITERAL_ERROR",
        "Literal error: expected true, got false",
    )
