"""Single-evaluation let-bindings for column expression pipelines.

Problem: Catalyst's CollapseProject + filter pushdown inline aliased
expressions into every use site. A cleaning chain like
``when(c.rlike(p), NULL).otherwise(c)`` references ``c`` twice, so a
5-stage chain over an expensive base (regex normalization of a
multi-KB body column) re-evaluates the base up to 2^5 times per row
once the stacked projections collapse — measured ~30× expression
duplication (254 regexp_replace nodes for 8 source expressions) and a
~10× slowdown on the ETL cleaning query.

Fix: bind intermediates as higher-order-function lambda variables.
``transform(array(x), v -> f(v))[0]`` evaluates ``x`` exactly once —
``v`` is a lambda variable (a cheap attribute), so ``f`` may reference
it freely — and Catalyst does not inline through lambda functions.
This keeps the whole pipeline in ONE narrow projection: no caching,
no shuffle barriers, no re-evaluation, scales linearly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let1(x: Column, f: Callable[[Column], Column]) -> Column:
    """Bind ``x`` once; ``f`` may reference it any number of times."""
    return F.transform(F.array(x), f)[0]


def let2(
    a: Column, b: Column, f: Callable[[Column, Column], Column]
) -> Column:
    """Bind two columns once each (struct-packed single-element array)."""
    packed = F.array(F.struct(a.alias("a"), b.alias("b")))
    return F.transform(packed, lambda s: f(s["a"], s["b"]))[0]


def piped(x: Column, *steps: Callable[[Column], Column]) -> Column:
    """Left-to-right pipeline where every stage's input is evaluated
    exactly once: piped(c, f, g) == g(f(c)) with single evaluation of
    ``c`` and of ``f(c)``."""
    out = x
    for step in steps:
        out = let1(out, step)
    return out
