"""User-defined checks — the reference's extensions surface (U1–U3,
SURVEY §2.6; ref ``src/check_datapackage/extensions.py``).

* :class:`CustomCheck` — ref ``CustomCheck.apply`` (extensions.py:21-93):
  user supplies a vectorized predicate ``Callable[[pd.Series],
  pd.Series]`` (bool, True = pass); the engine wraps it in an
  Arrow-batched pandas UDF and emits one violation per failing row.
  ``type="required"`` is forbidden exactly like the reference
  (extensions.py:61-69). Per BASELINE input_hint the pandas-UDF path is
  the engine's ONLY Python surface — no per-row Python.
* :class:`RequiredCheck` — ref ``RequiredCheck.apply``
  (extensions.py:141-211): make a column required → a C1 null check on
  that column (nested targets via dotted paths).
* :func:`apply_extensions` — ref extensions.py:264-283: fold all
  extension checks into the fused plan (still one scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .compile import CompiledCheck


class ExtensionError(ValueError):
    """Invalid extension declaration (config-time, ref extensions.py:61-69)."""


@dataclass(frozen=True)
class CustomCheck:
    """A user check over one column (ref extensions.py:21-93).

    ``check`` maps a pandas Series of column values to a boolean Series
    (True = value passes). ``type`` must not be "required"
    (ref extensions.py:61-69 raises on it).
    """

    type: str
    message: str
    column: str
    check: Callable[[pd.Series], pd.Series] = field(compare=False, hash=False)

    def __post_init__(self) -> None:
        if self.type == "required":
            raise ExtensionError(
                'The "required" type is reserved; use RequiredCheck instead.'
            )

    def compile(self) -> CompiledCheck:
        fn = self.check

        @F.pandas_udf(T.BooleanType())
        def _ok(s: pd.Series) -> pd.Series:
            out = fn(s)
            return out.astype(bool)

        col = F.col(self.column)
        return CompiledCheck(
            name=f"{self.column}.custom.{self.type}",
            column=self.column,
            issue_type=self.type,
            message=self.message,
            ok=col.isNull() | _ok(col),
            instance=col.cast("string"),
        )


@dataclass(frozen=True)
class RequiredCheck:
    """Make a column (possibly nested, dotted path) required
    (ref extensions.py:141-211)."""

    column: str
    message: Optional[str] = None

    def compile(self) -> CompiledCheck:
        col = F.col(self.column)
        return CompiledCheck(
            name=f"{self.column}.required.ext",
            column=self.column,
            issue_type="required",
            message=self.message or f"{self.column} is a required property",
            ok=col.isNotNull(),
            instance=col.cast("string"),
        )


def compile_extensions(extensions) -> list[CompiledCheck]:
    """Concat required + custom checks (ref apply_extensions,
    extensions.py:264-283) into compiled checks for the fused plan."""
    out: list[CompiledCheck] = []
    for ext in extensions or ():
        if hasattr(ext, "compile"):
            out.append(ext.compile())
        else:
            raise ExtensionError(f"not an extension: {ext!r}")
    return out
