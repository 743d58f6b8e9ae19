"""Backend-generic scalar expression layer.

The reference's compute kernels (solar geometry, Erbs decomposition, MRT,
UTCI polynomial, WBGT — reference ``main.py:109-205``) are pure element-wise
arithmetic. Instead of porting them three times, every kernel in
``kernels.py`` is written once against this tiny backend protocol and then
rendered as:

* **numpy** ndarray math — used by the pandas-UDF surface and golden tests;
* **Spark Column** trees — the production path (JVM whole-stage codegen,
  no Python worker in the hot loop);
* **SQL text** — the DuckDB oracle, guaranteeing the correctness gate
  compares two renderings of the *same* formula.

Backends only need ``+ - * / **`` (native operator overloading on ndarray /
Column / SqlExpr) plus the named functions below.
"""

from __future__ import annotations

import numpy as np


class NumpyBackend:
    """Render kernels as eager numpy math (float64)."""

    @staticmethod
    def let(name, x):
        """Bind an intermediate — numpy is eager, so it's already a value."""
        return x

    @staticmethod
    def lit(x):
        return x

    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    asin = staticmethod(np.arcsin)
    acos = staticmethod(np.arccos)
    atan = staticmethod(np.arctan)
    exp = staticmethod(np.exp)
    log = staticmethod(np.log)
    sqrt = staticmethod(np.sqrt)
    abs = staticmethod(np.abs)
    floor = staticmethod(np.floor)

    @staticmethod
    def power(a, b):
        return np.power(a, b)

    @staticmethod
    def radians(x):
        return np.radians(x)

    @staticmethod
    def degrees(x):
        return np.degrees(x)

    @staticmethod
    def where(cond, a, b):
        return np.where(cond, a, b)

    @staticmethod
    def greatest(a, b):
        return np.maximum(a, b)

    @staticmethod
    def least(a, b):
        return np.minimum(a, b)

    @staticmethod
    def hypot(a, b):
        # sqrt(a²+b²) rather than np.hypot: bit-identical across the three
        # backends (np.hypot uses a scaled algorithm that can differ by 1 ulp)
        return np.sqrt(a * a + b * b)


class SparkBackend:
    """Render kernels as native Spark Column expressions (codegen'd).

    ``let`` bindings: a kernel binds each reused intermediate (power
    ladders, vapour pressures, Newton iterates) to a generated column
    name; the query builder materializes them with sequential
    ``withColumn`` layers via :func:`apply_lets`. Catalyst's
    CollapseProject keeps multi-use non-trivial aliases as projection
    layers, so the analyzed tree stays near-linear in the number of
    kernel operations instead of exploding combinatorially — and plan
    *construction* stops paying thousands of py4j roundtrips for
    repeated subtrees.
    """

    def __init__(self):
        from pyspark.sql import functions as F

        self.F = F
        self.lets: list[tuple[str, object]] = []
        self._n = 0

    def let(self, name, expr):
        uname = f"__{name}_{self._n}"
        self._n += 1
        self.lets.append((uname, expr))
        return self.F.col(uname)

    def lit(self, x):
        return self.F.lit(float(x))

    def sin(self, x):
        return self.F.sin(x)

    def cos(self, x):
        return self.F.cos(x)

    def tan(self, x):
        return self.F.tan(x)

    def asin(self, x):
        return self.F.asin(x)

    def acos(self, x):
        return self.F.acos(x)

    def atan(self, x):
        return self.F.atan(x)

    def exp(self, x):
        return self.F.exp(x)

    def log(self, x):
        return self.F.log(x)

    def sqrt(self, x):
        return self.F.sqrt(x)

    def abs(self, x):
        return self.F.abs(x)

    def floor(self, x):
        # keep double type (SQL floor returns bigint in Spark)
        return self.F.floor(x).cast("double")

    def power(self, a, b):
        return self.F.pow(a, b)

    def radians(self, x):
        return self.F.radians(x)

    def degrees(self, x):
        return self.F.degrees(x)

    def where(self, cond, a, b):
        return self.F.when(cond, a).otherwise(b)

    def _col(self, x):
        from pyspark.sql import Column

        return x if isinstance(x, Column) else self.F.lit(float(x))

    # greatest/least are null-STRICT (unlike SQL GREATEST, which skips
    # nulls): numpy's maximum/minimum propagate NaN, and kernel outputs
    # must be null wherever any input is missing (FLT-2 depends on it).
    def greatest(self, a, b):
        a, b = self._col(a), self._col(b)
        return self.F.when(a.isNotNull() & b.isNotNull(), self.F.greatest(a, b))

    def least(self, a, b):
        a, b = self._col(a), self._col(b)
        return self.F.when(a.isNotNull() & b.isNotNull(), self.F.least(a, b))

    def hypot(self, a, b):
        # sqrt form, matching the numpy and SQL backends bit-for-bit
        return self.F.sqrt(a * a + b * b)


class SqlExpr:
    """A SQL expression fragment with operator overloading.

    Every composite is parenthesized, so precedence never depends on the
    target dialect. ``str(expr)`` yields ANSI SQL DuckDB accepts.
    """

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __str__(self) -> str:
        return self.s

    # -- helpers ---------------------------------------------------------
    @staticmethod
    def _w(x) -> str:
        if isinstance(x, SqlExpr):
            return x.s
        if isinstance(x, bool):
            return "TRUE" if x else "FALSE"
        if isinstance(x, (int, float, np.floating, np.integer)):
            return repr(float(x))
        raise TypeError(f"cannot embed {type(x)} in SQL")

    def _bin(self, op: str, other, rev: bool = False) -> "SqlExpr":
        a, b = SqlExpr._w(self), SqlExpr._w(other)
        if rev:
            a, b = b, a
        return SqlExpr(f"({a} {op} {b})")

    # -- arithmetic ------------------------------------------------------
    def __add__(self, o):
        return self._bin("+", o)

    def __radd__(self, o):
        return self._bin("+", o, rev=True)

    def __sub__(self, o):
        return self._bin("-", o)

    def __rsub__(self, o):
        return self._bin("-", o, rev=True)

    def __mul__(self, o):
        return self._bin("*", o)

    def __rmul__(self, o):
        return self._bin("*", o, rev=True)

    def __truediv__(self, o):
        return self._bin("/", o)

    def __rtruediv__(self, o):
        return self._bin("/", o, rev=True)

    def __pow__(self, o):
        return SqlExpr(f"POWER({SqlExpr._w(self)}, {SqlExpr._w(o)})")

    def __neg__(self):
        return SqlExpr(f"(- {self.s})")

    # -- comparisons (yield boolean SQL fragments) -----------------------
    def __gt__(self, o):
        return self._bin(">", o)

    def __ge__(self, o):
        return self._bin(">=", o)

    def __lt__(self, o):
        return self._bin("<", o)

    def __le__(self, o):
        return self._bin("<=", o)


class SqlBackend:
    """Render kernels as DuckDB-compatible SQL text.

    ``let`` bindings render as lateral column aliases (one inner SELECT,
    later aliases referencing earlier ones — see :func:`render_lets`), so
    the oracle text stays ~linear in kernel size: without them the pure
    textual substitution grows combinatorially (the UTCI chain reached
    650 KB of SQL and seconds of binder time).
    """

    def __init__(self):
        self.lets: list[tuple[str, str]] = []
        self._n = 0

    def let(self, name, expr) -> SqlExpr:
        uname = f"__{name}_{self._n}"
        self._n += 1
        self.lets.append((uname, str(SqlExpr._w(expr))))
        return SqlExpr(uname)

    @staticmethod
    def col(name: str) -> SqlExpr:
        return SqlExpr(name)

    @staticmethod
    def lit(x) -> SqlExpr:
        return SqlExpr(repr(float(x)))

    @staticmethod
    def _fn(name, *args) -> SqlExpr:
        return SqlExpr(f"{name}({', '.join(SqlExpr._w(a) for a in args)})")

    def sin(self, x):
        return self._fn("SIN", x)

    def cos(self, x):
        return self._fn("COS", x)

    def tan(self, x):
        return self._fn("TAN", x)

    def asin(self, x):
        return self._fn("ASIN", x)

    def acos(self, x):
        return self._fn("ACOS", x)

    def atan(self, x):
        return self._fn("ATAN", x)

    def exp(self, x):
        return self._fn("EXP", x)

    def log(self, x):
        return self._fn("LN", x)

    def sqrt(self, x):
        return self._fn("SQRT", x)

    def abs(self, x):
        return self._fn("ABS", x)

    def floor(self, x):
        return SqlExpr(f"CAST(FLOOR({SqlExpr._w(x)}) AS DOUBLE)")

    def power(self, a, b):
        return self._fn("POWER", a, b)

    def radians(self, x):
        return self._fn("RADIANS", x)

    def degrees(self, x):
        return self._fn("DEGREES", x)

    def where(self, cond, a, b):
        return SqlExpr(
            f"(CASE WHEN {SqlExpr._w(cond)} THEN {SqlExpr._w(a)} ELSE {SqlExpr._w(b)} END)"
        )

    # null-STRICT, matching SparkBackend's contract (FLT-2 semantics):
    # plain SQL GREATEST/LEAST *skip* nulls (GREATEST(NULL, x) = x in
    # DuckDB), which would diverge from the Spark rendering on any null
    # kernel input.
    def greatest(self, a, b):
        aw, bw = SqlExpr._w(a), SqlExpr._w(b)
        return SqlExpr(
            f"(CASE WHEN {aw} IS NULL OR {bw} IS NULL THEN NULL ELSE GREATEST({aw}, {bw}) END)"
        )

    def least(self, a, b):
        aw, bw = SqlExpr._w(a), SqlExpr._w(b)
        return SqlExpr(
            f"(CASE WHEN {aw} IS NULL OR {bw} IS NULL THEN NULL ELSE LEAST({aw}, {bw}) END)"
        )

    def hypot(self, a, b):
        # DuckDB has no HYPOT; same IEEE result for in-range inputs
        aw, bw = SqlExpr._w(a), SqlExpr._w(b)
        return SqlExpr(f"SQRT(({aw} * {aw}) + ({bw} * {bw}))")


def apply_lets(df, B: "SparkBackend"):
    """Materialize a SparkBackend's let-bindings as projection layers.

    Lets that don't reference each other are batched into ONE
    ``withColumns`` layer (topological levels of the dependency DAG), so
    the plan depth is the DAG depth, not the let count — in the
    interpreted/per-expression fallback path every Project layer is a row
    materialization, and the UTCI chain has ~24 lets but only ~10 levels.
    Dependencies are detected by scanning each binding's expression text
    for earlier let names (names are uniquified ``__name_N`` tokens, so a
    substring hit IS a reference; over-matching would only split a level,
    never break ordering)."""
    pending = list(B.lets)
    defined: set[str] = set()
    # Stringify each binding's tree ONCE up front: str(col._jc) is a py4j
    # round-trip that serializes the whole expression tree (milliseconds
    # for kernel-sized trees) — doing it per topological pass made plan
    # construction O(levels × lets) JVM calls. Measured on the flagship:
    # ~0.5 s of build time for zero plan difference.
    texts = {
        name: (str(col._jc) if hasattr(col, "_jc") else str(col)) for name, col in pending
    }
    while pending:
        level: list[tuple[str, object]] = []
        rest: list[tuple[str, object]] = []
        level_names: set[str] = set()
        for name, col in pending:
            expr_text = texts[name]
            # a let lands in this level only if it references nothing
            # still undefined (i.e. nothing in this pass's pending set,
            # including names just placed into the current level)
            if not any(n in expr_text for (n, _) in pending if n != name and n not in defined):
                level.append((name, col))
                level_names.add(name)
            else:
                rest.append((name, col))
        if not level:  # safety: fall back to strict sequential order
            name, col = pending[0]
            level = [(name, col)]
            rest = pending[1:]
            level_names = {name}
        df = df.withColumns(dict(level))
        defined |= level_names
        pending = rest
    return df


def drop_lets(df, B: "SparkBackend"):
    return df.drop(*[name for name, _ in B.lets])


def render_lets(B: "SqlBackend", select_list: str, from_table: str, where: str = "") -> str:
    """Wrap a SQL select over ``from_table`` so all let-bindings are
    available as lateral column aliases (DuckDB ≥0.8 resolves later
    aliases against earlier ones within one SELECT)."""
    if not B.lets:
        inner = from_table
    else:
        binds = ", ".join(f"{expr} AS {name}" for name, expr in B.lets)
        inner = f"(SELECT *, {binds} FROM {from_table})"
    w = f" WHERE {where}" if where else ""
    return f"SELECT {select_list} FROM {inner}{w}"
