"""Composable data validators (reference ``ml/df/Validator.scala``).

``Validator`` objects check one concern each and compose with ``&``
(the reference's ``and``); ``validate(df)`` returns a
``ValidationResult`` carrying per-violation messages and up to
``max_sample_rows`` offending rows, and ``get_or_throw`` raises a
typed :class:`~.errors.ValidationError`.

Each concrete validator is ONE Spark job: a filter on the violation
predicate with ``limit(max_sample_rows)`` — existence of a violating
row decides validity, and the same rows double as the samples. Array
columns (``array<double>`` features) check per element with
``exists``; scalar columns check directly.

This is the user-facing diagnostic surface; the engine's own fit-time
domain check (``kmeans._validate_domain``) stays a single fused
aggregation over a sampled prefix, per the one-job design rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import ValidationError

__all__ = [
    "ValidationResult", "ValidationViolation", "Validator",
    "CombinedValidator", "NoNaNValidator", "FiniteValidator",
    "PositiveValidator", "NotNullValidator",
    "ConsistentDimensionValidator", "NotEmptyValidator",
    "KernelCompatibilityValidator",
    "no_nan", "finite", "positive", "not_null", "consistent_dimension",
    "not_empty", "kernel_compatibility", "features", "weight",
]


@dataclass(frozen=True)
class ValidationViolation:
    """One failed rule (``Validator.scala:89-95``)."""

    message: str
    field: str
    violation_type: str  # e.g. "nan", "infinite", "negative"
    sample_rows: tuple = ()


@dataclass(frozen=True)
class ValidationResult:
    """Outcome + violations (``Validator.scala:31-78``)."""

    is_valid: bool
    violations: tuple = ()

    def and_(self, other: "ValidationResult") -> "ValidationResult":
        return ValidationResult(self.is_valid and other.is_valid,
                                self.violations + other.violations)

    __and__ = and_

    @property
    def message(self) -> str:
        if self.is_valid:
            return "Validation passed"
        lines = "\n".join(f"  - {v.message}" for v in self.violations)
        return (f"Validation failed with {len(self.violations)} "
                f"violations:\n{lines}")

    def get_or_throw(self) -> None:
        if not self.is_valid:
            raise ValidationError(self.message)

    @staticmethod
    def success() -> "ValidationResult":
        return ValidationResult(True)

    @staticmethod
    def failure(violation: ValidationViolation) -> "ValidationResult":
        return ValidationResult(False, (violation,))


def _elem_pred(df: DataFrame, col: str, pred):
    """Predicate over a scalar column, or ANY element of an array column."""
    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, T.ArrayType):
        return c.isNotNull() & F.exists(c, pred)
    return c.isNotNull() & pred(c)


class Validator:
    """One composable rule (``Validator.scala:108-126``)."""

    name = "validator"

    def validate(self, df: DataFrame) -> ValidationResult:
        raise NotImplementedError

    def and_(self, other: "Validator") -> "Validator":
        return CombinedValidator(self, other)

    __and__ = and_


class CombinedValidator(Validator):
    def __init__(self, first: Validator, second: Validator):
        self.first, self.second = first, second
        self.name = f"{first.name} and {second.name}"

    def validate(self, df: DataFrame) -> ValidationResult:
        return self.first.validate(df).and_(self.second.validate(df))


class _PredicateValidator(Validator):
    """Shared shape: violating-row probe with limit = sample size."""

    violation_type = "violation"

    def __init__(self, column_name: str, max_sample_rows: int = 5):
        self.column_name = column_name
        self.max_sample_rows = max_sample_rows

    def _violation_pred(self, df: DataFrame):
        raise NotImplementedError

    def _describe(self) -> str:
        raise NotImplementedError

    def validate(self, df: DataFrame) -> ValidationResult:
        rows = (df.where(self._violation_pred(df))
                .limit(self.max_sample_rows).collect())
        if not rows:
            return ValidationResult.success()
        return ValidationResult.failure(ValidationViolation(
            message=(f"Column '{self.column_name}' {self._describe()} "
                     f"(sample of {len(rows)} offending rows attached)"),
            field=self.column_name,
            violation_type=self.violation_type,
            sample_rows=tuple(rows),
        ))


class NoNaNValidator(_PredicateValidator):
    violation_type = "nan"

    @property
    def name(self):
        return f"noNaN({self.column_name})"

    def _violation_pred(self, df):
        return _elem_pred(df, self.column_name, F.isnan)

    def _describe(self):
        return "contains NaN values"


class FiniteValidator(_PredicateValidator):
    violation_type = "infinite"

    @property
    def name(self):
        return f"finite({self.column_name})"

    def _violation_pred(self, df):
        inf = float("inf")
        return _elem_pred(df, self.column_name,
                          lambda v: (v == inf) | (v == -inf))

    def _describe(self):
        return "contains infinite values"


class PositiveValidator(_PredicateValidator):
    def __init__(self, column_name: str, strict: bool = False,
                 max_sample_rows: int = 5):
        super().__init__(column_name, max_sample_rows)
        self.strict = strict

    violation_type = "negative"

    @property
    def name(self):
        return f"positive({self.column_name})"

    def _violation_pred(self, df):
        if self.strict:
            return _elem_pred(df, self.column_name, lambda v: v <= 0)
        return _elem_pred(df, self.column_name, lambda v: v < 0)

    def _describe(self):
        bound = "non-positive" if self.strict else "negative"
        return f"contains {bound} values"


class NotNullValidator(_PredicateValidator):
    violation_type = "null"

    @property
    def name(self):
        return f"notNull({self.column_name})"

    def _violation_pred(self, df):
        return F.col(self.column_name).isNull()

    def _describe(self):
        return "contains null values"


class ConsistentDimensionValidator(_PredicateValidator):
    """All vectors share one length (optionally a given one) —
    ``Validator.scala:359``. One extra tiny agg finds the reference
    dimension when none is supplied."""

    violation_type = "dimension_mismatch"

    def __init__(self, column_name: str, expected_dim: int | None = None,
                 max_sample_rows: int = 5):
        super().__init__(column_name, max_sample_rows)
        self.expected_dim = expected_dim

    @property
    def name(self):
        return f"consistentDimension({self.column_name})"

    def validate(self, df: DataFrame) -> ValidationResult:
        dim = self.expected_dim
        if dim is None:
            row = df.where(F.col(self.column_name).isNotNull()) \
                    .select(F.size(self.column_name).alias("d")).first()
            if row is None:
                return ValidationResult.success()
            dim = int(row["d"])
        rows = (df.where(F.col(self.column_name).isNotNull()
                         & (F.size(self.column_name) != dim))
                .limit(self.max_sample_rows).collect())
        if not rows:
            return ValidationResult.success()
        return ValidationResult.failure(ValidationViolation(
            message=(f"Column '{self.column_name}' has inconsistent "
                     f"dimensions (expected {dim})"),
            field=self.column_name, violation_type=self.violation_type,
            sample_rows=tuple(rows),
        ))


class NotEmptyValidator(Validator):
    name = "notEmpty"

    def validate(self, df: DataFrame) -> ValidationResult:
        if df.limit(1).count() > 0:
            return ValidationResult.success()
        return ValidationResult.failure(ValidationViolation(
            message="DataFrame is empty", field="*",
            violation_type="empty"))


class KernelCompatibilityValidator(Validator):
    """KL / Itakura–Saito / generalized-I require strictly positive
    features (``Validator.scala:453-466``)."""

    def __init__(self, kernel_name: str, features_col: str):
        self.kernel_name = kernel_name
        self.features_col = features_col
        self.name = f"kernelCompatibility({kernel_name})"

    def validate(self, df: DataFrame) -> ValidationResult:
        normalized = (self.kernel_name.lower()
                      .replace(" ", "").replace("-", "").replace("_", ""))
        if normalized in ("kl", "itakurasaito", "is", "generalizedi", "gi"):
            return PositiveValidator(self.features_col,
                                     strict=True).validate(df)
        return ValidationResult.success()


# -- factory functions (Validator.scala:468-530) ----------------------
def no_nan(column_name: str, max_sample_rows: int = 5) -> Validator:
    return NoNaNValidator(column_name, max_sample_rows)


def finite(column_name: str, max_sample_rows: int = 5) -> Validator:
    return (NoNaNValidator(column_name, max_sample_rows)
            & FiniteValidator(column_name, max_sample_rows))


def positive(column_name: str, strict: bool = False,
             max_sample_rows: int = 5) -> Validator:
    return PositiveValidator(column_name, strict, max_sample_rows)


def not_null(column_name: str, max_sample_rows: int = 5) -> Validator:
    return NotNullValidator(column_name, max_sample_rows)


def consistent_dimension(column_name: str, expected_dim: int | None = None,
                         max_sample_rows: int = 5) -> Validator:
    return ConsistentDimensionValidator(column_name, expected_dim,
                                        max_sample_rows)


def not_empty() -> Validator:
    return NotEmptyValidator()


def kernel_compatibility(kernel_name: str, features_col: str) -> Validator:
    return KernelCompatibilityValidator(kernel_name, features_col)


def features(column_name: str, expected_dim: int | None = None) -> Validator:
    """not-null ∧ finite ∧ consistent-dimension (``Validator.scala:517``)."""
    return (not_null(column_name) & finite(column_name)
            & consistent_dimension(column_name, expected_dim))


def weight(column_name: str) -> Validator:
    """not-null ∧ finite ∧ positive (``Validator.scala:524``)."""
    return (not_null(column_name) & finite(column_name)
            & positive(column_name))
