"""Confidence lattice for inferred values.

Mirrors the semantics of ``Infer<T>`` in the reference
(`/root/reference/osm2lanes/src/transform/tags_to_lanes/infer.rs:22-120`):
a value carries one of four confidence levels, ``none < default <
calculated < direct``; merging keeps the higher-confidence value and a
conflicting value at *equal* confidence is an error.

This lattice is strictly row-local — it never becomes a Spark type; it
lives only inside the Arrow-batch kernel.
"""

from __future__ import annotations

from typing import Any

NONE = 0
DEFAULT = 1
CALCULATED = 2
DIRECT = 3


class InferConflict(Exception):
    """Two different values inferred at the same confidence."""


class Infer:
    """A value with an inference confidence level."""

    __slots__ = ("conf", "value")

    def __init__(self, conf: int = NONE, value: Any = None):
        self.conf = conf
        self.value = value

    # --- constructors -------------------------------------------------
    @classmethod
    def none(cls) -> "Infer":
        return cls(NONE, None)

    @classmethod
    def default(cls, value: Any) -> "Infer":
        return cls(DEFAULT, value)

    @classmethod
    def calculated(cls, value: Any) -> "Infer":
        return cls(CALCULATED, value)

    @classmethod
    def direct(cls, value: Any) -> "Infer":
        """Direct if value is not None, else none (infer.rs:48-53)."""
        return cls(NONE, None) if value is None else cls(DIRECT, value)

    # --- accessors ----------------------------------------------------
    def is_none(self) -> bool:
        return self.conf == NONE

    def some(self) -> Any:
        """The value regardless of confidence; None when unset."""
        return None if self.conf == NONE else self.value

    def or_default(self, d: Any) -> "Infer":
        return Infer(DEFAULT, d) if self.conf == NONE else self

    def map(self, f) -> "Infer":
        if self.conf == NONE:
            return Infer.none()
        return Infer(self.conf, f(self.value))

    # --- merge --------------------------------------------------------
    def set(self, other: "Infer") -> None:
        """Monotone merge (infer.rs:76-97).

        Replaces the held value when ``other`` has higher confidence;
        ignores lower confidence; raises :class:`InferConflict` when a
        *different* value arrives at the *same* non-none confidence.
        """
        if other.conf == NONE:
            return
        if other.conf > self.conf:
            self.conf = other.conf
            self.value = other.value
            return
        if other.conf == self.conf:
            if self.value != other.value:
                raise InferConflict(f"{self.value!r} != {other.value!r}")
            return
        # lower confidence: ignore

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        names = {0: "None", 1: "Default", 2: "Calculated", 3: "Direct"}
        return f"Infer.{names[self.conf]}({self.value!r})"
