"""Column-expression utilities.

Catalyst's common-subexpression elimination does not reach through
higher-order-function lambdas: a Column expression referenced N times
inside a ``transform``/``aggregate`` lambda is re-evaluated N times per
element (HOFs always run interpreted, outside whole-stage codegen, and
each lambda invocation walks the full child expression tree). For an
expensive child — a regex ``split``, an md5 pipeline — this silently
multiplies the per-row cost by the reference count. Measured on the
``documents`` table at sf0.1: word-3-gram shingling dropped 9.4s -> 2.2s
from binding the token split once (see :func:`let`), and a MinHash
signature built as ``transform(seeds, ...)`` re-hashed every shingle
once per permutation until its pair array was bound.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``bound`` exactly once and pass the result to ``body``
    — a let-binding for Column expressions.

    Wraps ``bound`` as a single-element array and applies ``body`` via
    ``transform``: lambda variables are bound *values*, so ``body`` may
    reference its argument any number of times (including inside nested
    higher-order functions) without re-evaluating ``bound``.

    Use when a non-trivial expression is referenced more than once
    inside a higher-order-function lambda. For multi-reference
    expressions in a plain projection, prefer materializing a column in
    a preceding ``select`` — Catalyst's CollapseProject keeps
    multi-referenced non-cheap aliases as a separate projection, which
    stays in whole-stage codegen and is faster still than this
    (interpreted) wrapper.
    """
    return F.element_at(F.transform(F.array(bound), body), 1)
