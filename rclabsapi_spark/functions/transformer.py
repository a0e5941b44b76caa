"""TransformationRule compiler — the reference's record-transform engine.

The reference (data_transformer.hpp:9-22, data_transformer.cpp:45-116)
processes rows as string→string maps through an ordered list of
TransformationRules: each rule reads ``source_field`` (skipped if absent),
applies a string-keyed transformation with a string parameter map, and
writes ``target_field`` (possibly overwriting; later rules see earlier
rules' outputs).

Spark-first design: a rule list compiles to an ordered ``withColumn``
chain of Column expressions — one declarative plan, no per-row Python.
Catalyst fuses the chain into a single projection inside whole-stage
codegen, so a 50-rule pipeline costs one pass regardless of rule count.

Semantics reproduced exactly:
- ordering/overwrite (data_transformer.cpp:57-69): rules applied in list
  order; rule k+1 reads rule k's output.
- numeric failure passthrough (data_transformer.cpp:165-170): multiply/add
  on a non-numeric string returns the original value unchanged.
- unknown transformationType ⇒ identity (data_transformer.cpp:113-115).
- no-trailing-zeros serialization of numeric results
  (data_transformer.cpp:9-24) via ``fmt_no_trailing_zeros``.
- required-field validation (data_transformer.cpp:81-98): rows where a
  required source field is null/empty split to an error-side output.

The registry is the extension point (mirrors the string-keyed dispatch at
data_transformer.cpp:100-116): ``register_transformation`` adds new rule
types as Column-expression factories. Prefer builtins; a pandas_udf is the
designated fallback for rule types with no Spark builtin.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rclabsapi_spark.functions.scalars import fmt_no_trailing_zeros, trim_ws


@dataclass(frozen=True)
class TransformationRule:
    """Mirror of the reference rule struct (data_transformer.hpp:9-16)."""

    source_field: str
    target_field: str
    transformation_type: str
    parameters: Mapping[str, str] = field(default_factory=dict)

    @property
    def required(self) -> bool:
        return str(self.parameters.get("required", "")).lower() == "true"


TransformFactory = Callable[[Column, Mapping[str, str]], Column]

_REGISTRY: dict[str, TransformFactory] = {}


def register_transformation(name: str, factory: TransformFactory) -> None:
    """Extension point ≙ the reference's type dispatch
    (data_transformer.cpp:100-116)."""
    _REGISTRY[name] = factory


def _numeric_rule(op: Callable[[Column, Column], Column], param: str, default: str):
    """multiply/add (data_transformer.cpp:152-163): parse string → double,
    apply, re-serialize without trailing zeros; non-numeric input passes
    through unchanged (data_transformer.cpp:165-170)."""

    def factory(col: Column, params: Mapping[str, str]) -> Column:
        operand = F.lit(float(params.get(param, default)))
        # try_cast ≙ the reference's std::stod try-parse (ANSI-safe)
        as_num = col.try_cast("double")
        return F.when(
            as_num.isNotNull(), fmt_no_trailing_zeros(op(as_num, operand))
        ).otherwise(col)

    return factory


register_transformation("uppercase", lambda c, p: F.upper(c))
register_transformation("lowercase", lambda c, p: F.lower(c))
register_transformation("trim", lambda c, p: trim_ws(c))
register_transformation("multiply", _numeric_rule(lambda a, b: a * b, "factor", "1"))
register_transformation("add", _numeric_rule(lambda a, b: a + b, "addend", "0"))


def compile_rule(rule: TransformationRule) -> Column:
    """One rule → one Column expression over the current projection."""
    src = F.col(rule.source_field)
    factory = _REGISTRY.get(rule.transformation_type)
    if factory is None:
        # Unknown type ⇒ identity copy (data_transformer.cpp:113-115).
        return src
    return factory(src, rule.parameters)


def apply_rules(df: DataFrame, rules: Sequence[TransformationRule]) -> DataFrame:
    """transformRecord (data_transformer.cpp:57-69): start from all input
    fields, apply rules in order; later rules see earlier outputs. Rules
    whose source field is absent from the current schema are skipped."""
    for rule in rules:
        if rule.source_field not in df.columns:
            continue
        df = df.withColumn(rule.target_field, compile_rule(rule))
    return df


def required_field_flag(
    df: DataFrame, rules: Sequence[TransformationRule]
) -> Column:
    """P16 predicate: TRUE where any ``required=true`` rule's source is
    null/empty. As a Column it composes into a single-scan projection
    (withColumn) — splitting into two filtered DataFrames reads the
    source twice."""
    preds = [
        F.col(r.source_field).isNull() | (F.col(r.source_field) == "")
        for r in rules
        if r.required and r.source_field in df.columns
    ]
    if not preds:
        return F.lit(False)
    bad = preds[0]
    for p in preds[1:]:
        bad = bad | p
    return bad


def required_field_errors(
    df: DataFrame, rules: Sequence[TransformationRule]
) -> tuple[DataFrame, DataFrame]:
    """P16 (data_transformer.cpp:81-98): split rows failing any
    ``required=true`` rule (source null or empty) to an error-side output.
    Returns (valid, errors). Two filtered branches ⇒ two scans when both
    are consumed — use ``required_field_flag`` for single-pass tagging."""
    bad = required_field_flag(df, rules)
    return df.filter(~bad), df.filter(bad)


def rules_from_dicts(specs: Sequence[Mapping]) -> list[TransformationRule]:
    """Parse the reference's JSON rule-list wire format
    (ETLJobConfig.transformationRules, etl_job_models.hpp:14)."""
    return [
        TransformationRule(
            source_field=s["sourceField"],
            target_field=s.get("targetField", s["sourceField"]),
            transformation_type=s.get("transformationType", "identity"),
            parameters=dict(s.get("parameters", {})),
        )
        for s in specs
    ]
