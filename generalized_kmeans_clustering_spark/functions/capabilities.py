"""Kernel capability descriptors — the optimization-hint catalog.

Re-expression of the reference's ``KernelOps`` typeclass
(``ml/df/KernelOps.scala:46-320``): one frozen descriptor per kernel
holding the capability flags and optimization hints that drive
strategy auto-selection, instead of ad-hoc attributes scattered on the
kernel classes.

Flags (same semantics as the reference):

- ``se_fast_path`` — the distance decomposes as
  ``‖x‖² + ‖c‖² − 2·x·c`` so an assignment can use the squared-
  Euclidean fast shape (our Catalyst-expression argmin; the
  reference's broadcast cross-join). True for SE and for spherical
  *after* L2 normalization (``KernelOps.scala:188-210``).
- ``requires_positive`` — the divergence is only defined for
  (non-)negative features (KL/Itakura–Saito/Generalized-I); domain
  validation is mandatory, not best-effort.
- ``symmetric`` — D(x, y) = D(y, x). Bregman divergences are
  generally asymmetric; SE/L1/cosine are the symmetric ones.
- ``broadcast_threshold`` — number of centers below which the
  broadcast/expression assignment is recommended
  (``KernelOps.scala:100-115``); above it the chunked or Arrow path.
- ``benefits_from_normalization`` — L2-normalize features once before
  the Lloyd loop (spherical; ``KernelOps.scala:199-201``).

The registry is keyed by the canonical kernel name and by every alias
the kernel factory accepts, so ``capabilities_for("cosine")`` and
``capabilities_for(get_kernel("spherical"))`` return the same object.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["KernelCapabilities", "capabilities_for", "all_capabilities"]


@dataclass(frozen=True)
class KernelCapabilities:
    """Capability flags + optimization hints for one divergence kernel."""

    name: str
    se_fast_path: bool
    requires_positive: bool
    symmetric: bool
    broadcast_threshold: int
    benefits_from_normalization: bool = False
    #: centers are inv_grad(weighted grad mean) — False for L1 (median)
    mean_update: bool = True
    #: member of the Bregman family (L1/spherical are not)
    is_bregman: bool = True

    def recommended_assignment(self, num_centers: int) -> str:
        """Strategy hint mirroring ``KernelOps.recommendedAssignment``
        (``KernelOps.scala:100-115``): the SE fast shape below the
        broadcast threshold, the chunked/Arrow ladder above it."""
        if self.se_fast_path and num_centers < self.broadcast_threshold:
            return "expression"
        return "chunked"


# Thresholds follow the reference's per-kernel defaults
# (``KernelOps.scala``: SE/cosine 1000, Bregman family 500, L1 800).
_CORE = [
    KernelCapabilities(
        name="squaredEuclidean", se_fast_path=True, requires_positive=False,
        symmetric=True, broadcast_threshold=1000,
    ),
    KernelCapabilities(
        name="kl", se_fast_path=False, requires_positive=True,
        symmetric=False, broadcast_threshold=500,
    ),
    KernelCapabilities(
        name="generalizedI", se_fast_path=False, requires_positive=True,
        symmetric=False, broadcast_threshold=500,
    ),
    KernelCapabilities(
        name="itakuraSaito", se_fast_path=False, requires_positive=True,
        symmetric=False, broadcast_threshold=500,
    ),
    KernelCapabilities(
        name="logistic", se_fast_path=False, requires_positive=False,
        symmetric=False, broadcast_threshold=500,
    ),
    KernelCapabilities(
        name="l1", se_fast_path=False, requires_positive=False,
        symmetric=True, broadcast_threshold=800,
        mean_update=False, is_bregman=False,
    ),
    KernelCapabilities(
        name="spherical", se_fast_path=True, requires_positive=False,
        symmetric=True, broadcast_threshold=1000,
        benefits_from_normalization=True, is_bregman=False,
    ),
]

_REGISTRY: dict[str, KernelCapabilities] = {}


def _norm(name: str) -> str:
    return name.lower().replace("-", "").replace("_", "").replace(" ", "")


def _register() -> None:
    from .kernels import KERNELS

    by_name = {_norm(c.name): c for c in _CORE}
    _REGISTRY.update(by_name)
    # fold in every alias the kernel factory accepts
    for alias, cls in KERNELS.items():
        canonical = _norm(cls.name)
        if canonical in by_name:
            _REGISTRY[_norm(alias)] = by_name[canonical]


def capabilities_for(kernel) -> KernelCapabilities:
    """Descriptor for a kernel instance, class, or (alias) name."""
    if not _REGISTRY:
        _register()
    name = kernel if isinstance(kernel, str) else getattr(kernel, "name", None)
    if name is None:
        raise TypeError(f"not a kernel or kernel name: {kernel!r}")
    caps = _REGISTRY.get(_norm(name))
    if caps is None:
        from ..errors import UnknownKernel

        # UnknownKernel subclasses KeyError, preserving the registry-
        # lookup contract callers already catch
        raise UnknownKernel(name, sorted({c.name for c in _CORE}))
    return caps


def all_capabilities() -> list[KernelCapabilities]:
    """The full catalog (one entry per kernel, no alias duplicates)."""
    if not _REGISTRY:
        _register()
    return list(_CORE)
