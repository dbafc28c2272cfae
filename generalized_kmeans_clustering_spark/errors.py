"""Typed error hierarchy (reference ``ml/df/GKMError.scala``).

The reference models errors as a sealed ADT (``GKMError``) with an
``ErrorCategory`` and a ``toException`` bridge plus a ``GKMResult``
Success/Failure monad (``GKMError.scala:31-393``). The idiomatic Python
twin is an EXCEPTION hierarchy: every error is directly raisable and
catchable, and each category base also subclasses the stdlib exception
``toException`` would have produced — so code written against plain
``ValueError``/``KeyError``/``RuntimeError`` keeps working while code
that wants structure catches ``GKMError`` or a category base. The
Result monad has no Python twin on purpose: raising IS the propagation
mechanism here.

Message formats mirror the reference case-for-case so error text is
portable across the two engines.
"""

from __future__ import annotations

from enum import Enum

__all__ = [
    "ErrorCategory", "GKMError",
    "ValidationError", "ConfigurationError", "ConvergenceError",
    "DataError", "InternalError",
    "InvalidK", "InvalidTolerance", "InvalidMaxIterations", "InvalidSeed",
    "InvalidWeight", "UnknownKernel", "UnknownInitMethod",
    "IncompatibleTransform", "MissingColumn", "EmptyDataset",
    "InvalidFeatures", "DimensionMismatch", "ConvergenceFailure",
    "AllClustersEmpty", "CostIncreased", "UnexpectedNull", "InvalidState",
    "AssertionFailed",
]


class ErrorCategory(Enum):
    VALIDATION = "validation"
    CONFIGURATION = "configuration"
    CONVERGENCE = "convergence"
    DATA = "data"
    INTERNAL = "internal"


class GKMError(Exception):
    """Base of all engine errors; ``message`` and ``category`` mirror
    the reference trait (``GKMError.scala:31-46``)."""

    category: ErrorCategory

    @property
    def message(self) -> str:
        return str(self)


# category bases double as the stdlib types the reference's
# ``toException`` maps each category onto (GKMError.scala:40-46)
class ValidationError(GKMError, ValueError):
    category = ErrorCategory.VALIDATION


class ConfigurationError(GKMError, ValueError):
    # reference maps Configuration to IllegalStateException, but every
    # configuration error here is a bad ARGUMENT (unknown kernel name,
    # missing column) — ValueError is the honest Python base
    category = ErrorCategory.CONFIGURATION


class ConvergenceError(GKMError, RuntimeError):
    category = ErrorCategory.CONVERGENCE


class DataError(GKMError, ValueError):
    category = ErrorCategory.DATA


class InternalError(GKMError, RuntimeError):
    category = ErrorCategory.INTERNAL


def _loc(row_index=None, column_name=None) -> str:
    if row_index is not None and column_name is not None:
        return f" in column '{column_name}' at row {row_index}"
    if row_index is not None:
        return f" at row {row_index}"
    if column_name is not None:
        return f" in column '{column_name}'"
    return ""


# -- validation -------------------------------------------------------
class InvalidK(ValidationError):
    def __init__(self, k: int, n: int | None = None):
        self.k, self.n = k, n
        bound = f" and <= dataset size ({n})" if n is not None else ""
        super().__init__(f"Invalid k={k}: must be positive{bound}")


class InvalidTolerance(ValidationError):
    def __init__(self, tolerance: float):
        self.tolerance = tolerance
        super().__init__(f"Invalid tolerance={tolerance}: must be >= 0.0")


class InvalidMaxIterations(ValidationError):
    def __init__(self, max_iter: int, minimum: int = 1):
        self.max_iter = max_iter
        super().__init__(f"Invalid maxIter={max_iter}: must be >= {minimum}")


class InvalidSeed(ValidationError):
    def __init__(self, seed: int):
        self.seed = seed
        super().__init__(f"Invalid seed={seed}: must be >= 0")


class InvalidWeight(ValidationError):
    def __init__(self, weight: float, row_index: int | None = None):
        self.weight, self.row_index = weight, row_index
        super().__init__(
            f"Invalid weight={weight}{_loc(row_index)}: "
            "must be > 0.0 and finite")


# -- configuration ----------------------------------------------------
class UnknownKernel(ConfigurationError, KeyError):
    # also a KeyError: kernel lookup is a registry access, and callers
    # of get_kernel historically catch KeyError
    def __init__(self, name: str, supported=()):
        self.name, self.supported = name, list(supported)
        Exception.__init__(
            self,
            f"Unknown kernel '{name}'. Supported: {', '.join(self.supported)}")

    def __str__(self) -> str:  # KeyError would repr() the message
        return self.args[0]


class UnknownInitMethod(ConfigurationError):
    def __init__(self, method: str, supported=()):
        self.method, self.supported = method, list(supported)
        super().__init__(
            f"Unknown initialization method '{method}'. "
            f"Supported: {', '.join(self.supported)}")


class IncompatibleTransform(ConfigurationError):
    def __init__(self, transform: str, kernel: str, reason: str):
        self.transform, self.kernel, self.reason = transform, kernel, reason
        super().__init__(
            f"Transform '{transform}' incompatible with kernel "
            f"'{kernel}': {reason}")


class MissingColumn(ConfigurationError):
    def __init__(self, column_name: str, available=()):
        self.column_name, self.available = column_name, list(available)
        super().__init__(
            f"Missing required column '{column_name}'. "
            f"Available: {', '.join(self.available)}")


# -- data -------------------------------------------------------------
class EmptyDataset(DataError):
    def __init__(self, context: str = ""):
        self.context = context
        super().__init__(f"Empty dataset: {context}" if context
                         else "Empty dataset")


class InvalidFeatures(DataError):
    def __init__(self, reason: str, row_index: int | None = None,
                 column_name: str | None = None):
        self.reason = reason
        self.row_index, self.column_name = row_index, column_name
        super().__init__(
            f"Invalid features{_loc(row_index, column_name)}: {reason}")


class DimensionMismatch(DataError):
    def __init__(self, expected: int, actual: int,
                 row_index: int | None = None):
        self.expected, self.actual, self.row_index = expected, actual, row_index
        super().__init__(
            f"Dimension mismatch{_loc(row_index)}: "
            f"expected {expected}, got {actual}")


# -- convergence ------------------------------------------------------
class ConvergenceFailure(ConvergenceError):
    def __init__(self, max_iter: int, final_cost: float, cost_delta: float):
        self.max_iter, self.final_cost, self.cost_delta = \
            max_iter, final_cost, cost_delta
        super().__init__(
            f"Failed to converge after {max_iter} iterations "
            f"(final cost={final_cost:.4f}, delta={cost_delta:.6f})")


class AllClustersEmpty(ConvergenceError):
    def __init__(self, iteration: int):
        self.iteration = iteration
        super().__init__(f"All clusters became empty at iteration {iteration}")


class CostIncreased(ConvergenceError):
    def __init__(self, iteration: int, previous_cost: float,
                 current_cost: float):
        self.iteration = iteration
        self.previous_cost, self.current_cost = previous_cost, current_cost
        super().__init__(
            f"Cost increased at iteration {iteration}: "
            f"{previous_cost:.4f} -> {current_cost:.4f} "
            f"(delta={current_cost - previous_cost:.4f})")


# -- internal ---------------------------------------------------------
class UnexpectedNull(InternalError):
    def __init__(self, context: str):
        self.context = context
        super().__init__(f"Unexpected null value: {context}")


class InvalidState(InternalError):
    def __init__(self, description: str):
        self.description = description
        super().__init__(f"Invalid internal state: {description}")


class AssertionFailed(InternalError):
    def __init__(self, assertion: str, context: str = ""):
        self.assertion, self.context = assertion, context
        super().__init__(
            f"Assertion failed: {assertion} ({context})" if context
            else f"Assertion failed: {assertion}")
