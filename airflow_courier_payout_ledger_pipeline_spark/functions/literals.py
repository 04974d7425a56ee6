"""Large collected-state literals, constructed in ONE py4j round-trip.

``F.lit(some_list)`` is a single plan NODE, but on classic PySpark its
CONSTRUCTION converts per element (one py4j-visible conversion each):
measured 0.75 s for a 2048-element list — pure driver-side overhead paid on
every query build, the same pathology class as round 6's per-bucket
``F.array`` heavy_hitters regression, one layer down. Rendering the array as
a SQL ``array(...)`` literal string and parsing it JVM-side costs ~2 ms for
the same 2048 elements (one ``expr`` call, one parse) and yields the
identical Literal-array plan node.

Round-trip safety: integers render exactly (``L`` suffix → BIGINT literals);
floats render via ``repr`` — Python's shortest round-trip form — and Spark's
SQL parser converts decimal text to double with correct rounding, so the
parsed double is bit-identical to the Python value (``D`` suffix → DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Column memo keyed on the VALUES (r18): the rendered text still parses in
#: ~2 ms, but a bench/driver process re-renders and re-parses the same
#: collected state hundreds of times (the DSIR ratio array, the bloom word
#: array, the CMS rows). Content keys cannot go stale — a different state is
#: a different key; a Column is an immutable unresolved-expression AST, so
#: this caches construction METADATA only (the state collect that produced
#: the values still runs at every query build). Capped, cleared wholesale on
#: overflow.
_LIT_MEMO: dict[tuple, Column] = {}
_LIT_MEMO_CAP = 256


def array_lit(values: list) -> Column:
    """One-call array literal for a collected state (ints → ARRAY<BIGINT>,
    floats → ARRAY<DOUBLE>). Raises on empty or mixed input — a state literal
    always has a known uniform element type; an empty state must short-circuit
    at the call site (e.g. to ``lit(False)``), never probe a typed empty
    array."""
    if not values:
        raise ValueError("array_lit needs a non-empty list (empty state: short-circuit at the call site)")
    if all(isinstance(v, bool) for v in values):
        raise TypeError("array_lit supports int/float states, not bool")
    if all(isinstance(v, int) for v in values):
        body = ",".join(f"{v}L" for v in values)
    elif all(isinstance(v, float) for v in values):
        body = ",".join(f"{v!r}D" for v in values)
    else:
        raise TypeError("array_lit needs all-int or all-float values")
    key = ("arr", body)
    col = _LIT_MEMO.get(key)
    if col is None:
        if len(_LIT_MEMO) >= _LIT_MEMO_CAP:
            _LIT_MEMO.clear()
        col = F.expr(f"array({body})")
        _LIT_MEMO[key] = col
    return col
