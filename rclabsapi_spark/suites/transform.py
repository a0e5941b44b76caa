"""Transformer + scalar-function suite (SURVEY §2.2 P1/P16, §2.8 F1-F23,
§2.10).

The rule-compiler queries run the engine's TransformationRule registry over
a stringly projection of the fixture tables — reproducing the reference's
stringly-typed record semantics (ordering/overwrite, numeric failure
passthrough, no-trailing-zeros serialization) with exact DuckDB parity.

Number-string parity note: both sides materialize numeric strings through
the same printf format (``%.2f`` input / ``%.6f`` output) so the parsed
doubles and the serialized results are bit-identical — double→string casts
are never used as data (engines disagree on scientific notation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rclabsapi_spark.catalog import load_table
from rclabsapi_spark.functions.transformer import (
    TransformationRule,
    apply_rules,
    required_field_errors,
    required_field_flag,
)
from rclabsapi_spark.registry import query

# The stringly "records" projection (FIXTURES.md §7 analog on customer).
_RECORDS_SQL = """
    SELECT CAST(c_custkey AS VARCHAR) AS record_id,
           c_name AS name,
           '  ' || c_mktsegment || CHR(9) AS seg,
           printf('%.2f', c_acctbal) AS bal
    FROM customer
"""


def _records_df(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("string").alias("record_id"),
        F.col("c_name").alias("name"),
        F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("\t")).alias("seg"),
        F.format_string("%.2f", F.col("c_acctbal")).alias("bal"),
    )


_RULES = [
    # chained: rule 2 reads rule 1's output (ordering semantics P1)
    TransformationRule("name", "name_u", "uppercase"),
    TransformationRule("name_u", "name_l", "lowercase"),
    # overwrite: target == source
    TransformationRule("seg", "seg", "trim"),
    # numeric with formatting (F11/F13)
    TransformationRule("bal", "bal_x", "multiply", {"factor": "2.5"}),
    TransformationRule("bal", "bal_plus", "add", {"addend": "10.25"}),
    # failure passthrough: non-numeric input unchanged (data_transformer.cpp:165-170)
    TransformationRule("name", "name_mult", "multiply", {"factor": "2"}),
    # unknown type ⇒ identity (F14)
    TransformationRule("bal", "bal_id", "reverse_polarity"),
]

# DuckDB mirror of fmt_no_trailing_zeros (printf %.6f, strip zeros then dot).
_FMT = (
    "regexp_replace(regexp_replace(printf('%.6f', {x}),"
    " '(\\.\\d*?)0+$', '\\1'), '\\.$', '')"
)

_TRANSFORM_ORACLE = f"""
WITH rec AS ({_RECORDS_SQL})
SELECT record_id, name,
       upper(name) AS name_u,
       lower(upper(name)) AS name_l,
       trim(replace(seg, CHR(9), ' ')) AS seg,
       bal,
       {_FMT.format(x="CAST(bal AS DOUBLE) * 2.5")} AS bal_x,
       {_FMT.format(x="CAST(bal AS DOUBLE) + 10.25")} AS bal_plus,
       name AS name_mult,
       bal AS bal_id
FROM rec
"""


@query("transformer_rules", _TRANSFORM_ORACLE)
def q_transformer(spark, sf_dir):
    """P1 + F1-F3, F11-F14 — ordered rule application with overwrite,
    chaining, numeric passthrough and no-trailing-zeros serialization
    (data_transformer.cpp:45-170)."""
    rec = _records_df(spark, sf_dir)
    return apply_rules(rec, _RULES).select(
        "record_id", "name", "name_u", "name_l", "seg", "bal",
        "bal_x", "bal_plus", "name_mult", "bal_id",
    )


_VALIDATION_ORACLE = f"""
WITH rec AS (
    SELECT doc_id,
           CASE WHEN n_chars >= 150 THEN text END AS required_field,
           lang
    FROM documents
)
SELECT doc_id, lang,
       (required_field IS NULL OR required_field = '') AS is_error
FROM rec
"""


@query("p16_required_field_split", _VALIDATION_ORACLE)
def q_p16(spark, sf_dir):
    """P16 — required-field validation split (data_transformer.cpp:81-98):
    flag rows whose required source is null/empty."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") >= 150, F.col("text")).alias("required_field"),
        "lang",
    )
    rules = [TransformationRule("required_field", "out", "trim", {"required": "true"})]
    # single-scan tagging (required_field_flag); the valid/errors split
    # (required_field_errors) would read the table once per side
    return docs.select(
        "doc_id", "lang", required_field_flag(docs, rules).alias("is_error")
    )


@query(
    "f_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           concat_ws('-', c_name, c_mktsegment) AS name_seg,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name)::INT AS name_len,
           starts_with(c_name, 'Customer') AS is_customer,
           contains(c_name, '42') AS has_42,
           replace(c_name, '#', '_') AS name_safe
    FROM customer
    """,
)
def q_strings(spark, sf_dir):
    """F1-F7 — string function surface (string_utils.hpp:46-217)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("name_seg"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.col("c_name").startswith("Customer").alias("is_customer"),
        F.col("c_name").contains("42").alias("has_42"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("_")).alias("name_safe"),
    )


@query(
    "f14_validation_predicates",
    """
    SELECT c_custkey, c_name,
           regexp_matches(c_name, '^[A-Za-z0-9#_-]{1,64}$') AS valid_job_id,
           (length(c_name) BETWEEN 8 AND 128
            AND regexp_matches(c_name, '[A-Z]')
            AND regexp_matches(c_name, '[a-z]')
            AND regexp_matches(c_name, '[0-9]')) AS valid_password_shape,
           regexp_matches(lower(c_name),
                          '(''|--|;|\\b(union|select|insert|update|delete|drop|exec)\\b)')
               AS sqli_suspect
    FROM customer
    """,
)
def q_validation(spark, sf_dir):
    """P14/F9/F10 — validation predicates as distributed column checks
    (input_validator.cpp:152-189, 577-587). Uses the shared predicate
    library (functions/validation.py) — the job-id regex is widened to
    allow '#' because fixture names are `Customer#N` (the reference
    pattern has no '#')."""
    from rclabsapi_spark.functions.validation import (
        contains_sql_injection,
        is_valid_password,
    )

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_name",
        F.col("c_name").rlike(r"^[A-Za-z0-9#_-]{1,64}$").alias("valid_job_id"),
        is_valid_password(F.col("c_name")).alias("valid_password_shape"),
        contains_sql_injection(F.col("c_name")).alias("sqli_suspect"),
    )


@query(
    "f15_f16_timestamp_roundtrip",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'),
                    '%Y-%m-%dT%H:%M:%S') AS ts_parsed
    FROM events
    """,
)
def q_ts_roundtrip(spark, sf_dir):
    """F15/F16 — `%Y-%m-%d %H:%M:%S` UTC format + ISO-8601 parse
    (request_handler.cpp:1455-1487)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("ts_parsed"),
    )


@query(
    "f17_f19_computed_metrics",
    """
    SELECT event_id,
           epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts)
               AS age_ms,
           CASE WHEN (epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts))
                     / 1000.0 > 0
                THEN value / ((epoch_ms(TIMESTAMP '2024-02-01 00:00:00')
                               - epoch_ms(ts)) / 1000.0)
                ELSE 0.0 END AS rate_per_sec
    FROM events
    """,
)
def q_f17(spark, sf_dir):
    """F17/F19 — ms age vs frozen now + guarded rate
    (request_handler.cpp:955-1000)."""
    ev = load_table(spark, sf_dir, "events")
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    # Defensive no-op under the pinned session config (session.py sets
    # inferTimestampNTZ.enabled=false, so ts already reads as LTZ); kept
    # because unix_millis rejects the NTZ type the default inference
    # would yield, and the guard is free in a UTC session.
    ts_ltz = F.col("ts").cast("timestamp")
    age = (F.unix_millis(now) - F.unix_millis(ts_ltz)).alias("age_ms")
    sec = (F.unix_millis(now) - F.unix_millis(ts_ltz)) / 1000.0
    return ev.select(
        "event_id",
        age,
        F.when(sec > 0, F.col("value") / sec).otherwise(0.0).alias("rate_per_sec"),
    )


@query(
    "f18_window_ids",
    """
    SELECT event_id, date_trunc('minute', ts) AS minute_id,
           date_trunc('hour', ts) AS hour_id
    FROM events
    """,
)
def q_f18(spark, sf_dir):
    """F18 — epoch-minute/hour window ids (rate_limiter.cpp:206-214)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("minute", "ts").alias("minute_id"),
        F.date_trunc("hour", "ts").alias("hour_id"),
    )


@query(
    "f21_json_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def q_f21(spark, sf_dir):
    """F21 — JSON field extraction (job_monitoring_models.cpp:646-670)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "f22_json_construct",
    """
    SELECT event_id,
           '{"event_id":' || event_id || ',"event_type":"' || event_type
           || '","user_id":' || user_id || '}' AS payload
    FROM events
    """,
)
def q_f22(spark, sf_dir):
    """F22 — JSON payload construction (JobMetrics::toJson,
    job_monitoring_models.cpp:9-51). Built with to_json(struct(...)) —
    key order is the struct field order, matched in the oracle string."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_id"), F.col("event_type"), F.col("user_id")
            )
        ).alias("payload"),
    )
