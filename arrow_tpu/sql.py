"""SQL frontend over the engine's kernels.

The reference ships no SQL engine (arrow-rs FlightSQL sql/server.rs
delegates query execution to the application) — this module is the
application-side executor for this engine's FlightSQL service and CLI.
Every clause lowers onto the engine's own operators: WHERE -> ops.cmp/
boolean + filter, JOIN -> ops.join, GROUP BY/aggregates -> ops.groupby,
ORDER BY -> ops.sort, projection/expressions -> ops.numeric/strings/
cast.

Supported grammar:

    SELECT expr [AS alias] [, ...] | *
    FROM t [ [INNER|LEFT] JOIN t2 ON t.a = t2.b ]
    [WHERE <bool expr>]
    [GROUP BY col [, ...]] [HAVING <bool expr over aggregates>]
    [ORDER BY expr [ASC|DESC] [, ...]]
    [LIMIT n [OFFSET m]]

Expressions: +-*/%, comparisons, AND/OR/NOT, parentheses, IS [NOT]
NULL, [NOT] IN (...), BETWEEN a AND b, [NOT] LIKE, CAST(e AS type),
ABS/UPPER/LOWER/LENGTH/COALESCE, aggregates COUNT(*)/COUNT/SUM/MIN/
MAX/AVG.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import dtypes as dt
from .core.column import Column, column as make_col
from .core.datum import scalar as make_scalar
from .core.table import Table
from .errors import ArrowInvalid

__all__ = ["execute_sql", "execute_sql_update", "bind_sql_params"]


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*|\.\d+|\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<id>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><=|>=|<>|!=|=|<|>|\+|-|\*|/|%|\(|\)|,|\.|;)
    )""", re.VERBOSE)

_KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order",
    "limit", "offset", "as", "and", "or", "not", "in", "between",
    "like", "is", "null", "true", "false", "asc", "desc", "join",
    "inner", "left", "on", "cast", "distinct",
}


def _tokenize(q: str) -> List[Tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m:
            if q[pos:].strip() == "":
                break
            raise ArrowInvalid(f"SQL tokenize error at {q[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("id") is not None:
            low = m.group("id").lower()
            out.append(("kw" if low in _KEYWORDS else "id",
                        low if low in _KEYWORDS else m.group("id")))
        else:
            op = m.group("op")
            if op == ";":
                break
            out.append(("op", op))
    out.append(("end", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Lit:
    value: object


@dataclass
class Col:
    table: Optional[str]
    name: str


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Un:
    op: str            # not / neg / isnull / notnull
    operand: object


@dataclass
class Func:
    name: str
    args: list
    cast_to: Optional[str] = None


@dataclass
class Agg:
    fn: str            # count/sum/min/max/avg/count_all
    arg: object        # expr or None for count(*)


@dataclass
class InList:
    expr: object
    items: list
    negated: bool


@dataclass
class Between:
    expr: object
    lo: object
    hi: object


@dataclass
class LikeOp:
    expr: object
    pattern: str
    negated: bool


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, typ, val=None):
        t = self.peek()
        if t[0] == typ and (val is None or t[1] == val):
            self.i += 1
            return t
        return None

    def expect(self, typ, val=None):
        t = self.accept(typ, val)
        if t is None:
            raise ArrowInvalid(
                f"SQL parse error: expected {val or typ}, got "
                f"{self.peek()!r}")
        return t

    # -- expression grammar (precedence climbing) --
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        e = self.and_expr()
        while self.accept("kw", "or"):
            e = Bin("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "and"):
            e = Bin("and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.accept("kw", "not"):
            return Un("not", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        t = self.peek()
        if t[0] == "op" and t[1] in ("=", "!=", "<>", "<", "<=", ">",
                                     ">="):
            self.next()
            return Bin(t[1], e, self.add_expr())
        if t == ("kw", "is"):
            self.next()
            neg = self.accept("kw", "not") is not None
            self.expect("kw", "null")
            return Un("notnull" if neg else "isnull", e)
        neg = False
        if t == ("kw", "not"):
            self.next()
            neg = True
            t = self.peek()
        if t == ("kw", "in"):
            self.next()
            self.expect("op", "(")
            items = [self.expr()]
            while self.accept("op", ","):
                items.append(self.expr())
            self.expect("op", ")")
            return InList(e, items, neg)
        if t == ("kw", "between"):
            self.next()
            lo = self.add_expr()
            self.expect("kw", "and")
            hi = self.add_expr()
            out = Between(e, lo, hi)
            return Un("not", out) if neg else out
        if t == ("kw", "like"):
            self.next()
            pat = self.expect("str")[1]
            return LikeOp(e, pat, neg)
        if neg:
            raise ArrowInvalid("SQL parse error after NOT")
        return e

    def add_expr(self):
        e = self.mul_expr()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("+", "-"):
                self.next()
                e = Bin(t[1], e, self.mul_expr())
            else:
                return e

    def mul_expr(self):
        e = self.unary()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("*", "/", "%"):
                self.next()
                e = Bin(t[1], e, self.unary())
            else:
                return e

    def unary(self):
        if self.accept("op", "-"):
            return Un("neg", self.unary())
        if self.accept("op", "+"):
            return self.unary()
        return self.atom()

    def atom(self):
        t = self.peek()
        if t[0] == "num":
            self.next()
            return Lit(float(t[1]) if "." in t[1] else int(t[1]))
        if t[0] == "str":
            self.next()
            return Lit(t[1])
        if t == ("kw", "null"):
            self.next()
            return Lit(None)
        if t == ("kw", "true"):
            self.next()
            return Lit(True)
        if t == ("kw", "false"):
            self.next()
            return Lit(False)
        if t == ("kw", "cast"):
            self.next()
            self.expect("op", "(")
            e = self.expr()
            self.expect("kw", "as")
            ty = self.expect("id")[1]
            self.expect("op", ")")
            return Func("cast", [e], cast_to=ty)
        if self.accept("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return e
        if t[0] == "id":
            self.next()
            name = t[1]
            if self.accept("op", "("):          # function / aggregate
                low = name.lower()
                if low == "count" and self.accept("op", "*"):
                    self.expect("op", ")")
                    return Agg("count_all", None)
                args = []
                if not self.accept("op", ")"):
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                if low in ("count", "sum", "min", "max", "avg"):
                    if len(args) != 1:
                        raise ArrowInvalid(f"{name} takes one argument")
                    return Agg("mean" if low == "avg" else low, args[0])
                return Func(low, args)
            if self.accept("op", "."):
                col = self.expect("id")[1]
                return Col(name, col)
            return Col(None, name)
        raise ArrowInvalid(f"SQL parse error at {t!r}")


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

_CMP = {"=": "eq", "!=": "neq", "<>": "neq",
        "<": "lt", "<=": "lt_eq", ">": "gt", ">=": "gt_eq"}

_SQL_TYPES = {
    "int": dt.int64, "integer": dt.int64, "bigint": dt.int64,
    "smallint": dt.int16, "tinyint": dt.int8, "float": dt.float32,
    "real": dt.float32, "double": dt.float64, "varchar": dt.utf8,
    "text": dt.utf8, "string": dt.utf8, "boolean": dt.bool_,
    "bool": dt.bool_, "date": dt.date32,
}


def _sql_type(name: str) -> dt.DataType:
    low = name.lower()
    if low in _SQL_TYPES:
        return _SQL_TYPES[low]
    if low == "timestamp":
        return dt.timestamp("us")
    if hasattr(dt, low):
        v = getattr(dt, low)
        if isinstance(v, dt.DataType):
            return v
    raise ArrowInvalid(f"unknown SQL type {name!r}")


def _is_agg(e) -> bool:
    if isinstance(e, Agg):
        return True
    if isinstance(e, Bin):
        return _is_agg(e.left) or _is_agg(e.right)
    if isinstance(e, Un):
        return _is_agg(e.operand)
    if isinstance(e, Func):
        return any(_is_agg(a) for a in e.args)
    return False


class _Evaluator:
    """Expression -> Column over a table (non-aggregate context)."""

    def __init__(self, t: Table, aliases: Dict[str, str],
                 suffixes: Optional[Dict[str, str]] = None):
        self.t = t
        self.aliases = aliases       # table alias -> table name
        self.suffixes = suffixes or {}   # table name -> join suffix

    def colname(self, e: Col) -> str:
        """The resolved PHYSICAL column name for a (maybe qualified)
        reference — aliases + join suffixes, same candidate order as
        the colref() parser helper."""
        cands = [e.name]
        if e.table is not None:
            tname = self.aliases.get(e.table, e.table)
            cands = [f"{tname}.{e.name}", e.name]
            # a joined right table's colliding columns carry a suffix —
            # a qualified reference prefers the suffixed name
            sfx = self.suffixes.get(tname)
            if sfx:
                cands.insert(0, f"{e.name}{sfx}")
        for c in cands:
            if c in self.t.column_names:
                return c
        raise ArrowInvalid(f"no such column {e.name!r}")

    def col(self, e: Col) -> Column:
        return self.t.column(self.colname(e))

    def eval(self, e) -> Column:
        from .ops import boolean as b_ops
        from .ops import cmp as c_ops
        from .ops import numeric as n_ops
        if isinstance(e, Lit):
            n = max(self.t.num_rows, 0)
            if n == 0 and e.value is not None:
                # typed empty: make_col([]) would infer the null dtype
                # and break arithmetic over empty tables
                d = {int: dt.int64, float: dt.float64, bool: dt.bool_,
                     str: dt.utf8}.get(type(e.value))
                if d is not None:
                    return make_col([], d)
            return make_col([e.value] * n)
        if isinstance(e, Col):
            return self.col(e)
        if isinstance(e, Bin):
            if e.op in ("and", "or"):
                lc, rc = self.eval(e.left), self.eval(e.right)
                return getattr(b_ops, f"{e.op}_kleene")(lc, rc)
            lc, rc = self._coerce_pair(e.left, e.right)
            if e.op in _CMP:
                return getattr(c_ops, _CMP[e.op])(lc, rc)
            fn = {"+": "add", "-": "sub", "*": "mul", "/": "div",
                  "%": "rem"}[e.op]
            return getattr(n_ops, fn)(lc, rc)
        if isinstance(e, Un):
            if e.op == "not":
                return b_ops.not_(self.eval(e.operand))
            if e.op == "neg":
                return n_ops.neg(self.eval(e.operand))
            c = self.eval(e.operand)
            m = b_ops.is_null(c)
            return b_ops.not_(m) if e.op == "notnull" else m
        if isinstance(e, InList):
            acc = None
            for item in e.items:
                m = self.eval(Bin("=", e.expr, item))
                acc = m if acc is None else b_ops.or_kleene(acc, m)
            if acc is None:
                acc = make_col([False] * self.t.num_rows)
            return b_ops.not_(acc) if e.negated else acc
        if isinstance(e, Between):
            lo = self.eval(Bin(">=", e.expr, e.lo))
            hi = self.eval(Bin("<=", e.expr, e.hi))
            return b_ops.and_kleene(lo, hi)
        if isinstance(e, LikeOp):
            from .ops import strings as s_ops
            m = s_ops.like(self.eval(e.expr), e.pattern)
            return b_ops.not_(m) if e.negated else m
        if isinstance(e, Func):
            return self._func(e)
        raise ArrowInvalid(f"cannot evaluate {e!r}")

    def _coerce_pair(self, le, re_):
        """Evaluate a binary op's operands with SQL literal coercion:
        a literal takes the column side's dtype (int literal vs float
        column -> float scalar; float literal vs int column -> the
        COLUMN is widened to float64)."""
        from .ops.cast import cast as cast_kernel

        def typed_scalar(lit, other):
            v = lit.value
            d = other.dtype
            if isinstance(v, int) and d.is_floating:
                return make_scalar(float(v), d), other
            if isinstance(v, float) and d.is_integer:
                return make_scalar(v, dt.float64), \
                    cast_kernel(other, dt.float64)
            if isinstance(v, bool):
                return make_scalar(v), other
            if v is None:
                return make_scalar(None, d), other
            if isinstance(v, str):
                # cmp/strings kernels take raw str scalars (no tensor
                # representation exists for utf8 scalars)
                return v, other
            return make_scalar(v, d), other

        llit = isinstance(le, Lit)
        rlit = isinstance(re_, Lit)
        if llit and not rlit:
            rc = self.eval(re_)
            lc, rc = typed_scalar(le, rc)
            return lc, rc
        if rlit and not llit:
            lc = self.eval(le)
            rc, lc = typed_scalar(re_, lc)
            return lc, rc
        if llit and rlit:
            return make_scalar(le.value), make_scalar(re_.value)
        lc, rc = self.eval(le), self.eval(re_)
        if lc.dtype != rc.dtype:
            if lc.dtype.is_integer and rc.dtype.is_floating:
                lc = cast_kernel(lc, rc.dtype)
            elif lc.dtype.is_floating and rc.dtype.is_integer:
                rc = cast_kernel(rc, lc.dtype)
            elif lc.dtype.is_integer and rc.dtype.is_integer:
                lc = cast_kernel(lc, dt.int64)
                rc = cast_kernel(rc, dt.int64)
        return lc, rc

    def _func(self, e: Func):
        from .ops.cast import cast as cast_kernel
        from .ops import cmp as c_ops
        from .ops import numeric as n_ops
        from .ops import strings as s_ops
        if e.name == "cast":
            return cast_kernel(self.eval(e.args[0]),
                               _sql_type(e.cast_to))
        if e.name == "abs":
            from .ops import select_misc as sm
            c = self.eval(e.args[0])
            return sm.zip_(c_ops.lt(c, make_scalar(0, c.dtype)),
                           n_ops.neg(c), c)
        if e.name in ("upper", "lower"):
            return getattr(s_ops, e.name)(self.eval(e.args[0]))
        if e.name == "length":
            return s_ops.length(self.eval(e.args[0]))
        if e.name == "coalesce":
            from .core.column import NullColumn
            from .ops import select_misc as sm
            from .ops import boolean as b_ops
            out = None
            for a in e.args:
                c = self.eval(a)
                if isinstance(c, NullColumn):
                    continue         # contributes nothing
                if out is None:
                    out = c
                else:
                    mask = b_ops.is_null(out)
                    out = sm.zip_(mask, c, out)
            return out if out is not None \
                else make_col([None] * self.t.num_rows)
        raise ArrowInvalid(f"unknown function {e.name}")


def _select_items(p: _Parser):
    if p.accept("op", "*"):
        return None                  # SELECT *
    items = []
    while True:
        e = p.expr()
        alias = None
        if p.accept("kw", "as"):
            alias = p.expect("id")[1]
        elif p.peek()[0] == "id" and p.peek(1)[1] in (",", "from"):
            alias = p.next()[1]      # bare alias: SELECT expr alias
        items.append((e, alias))
        if not p.accept("op", ","):
            return items


def _default_name(e, i: int) -> str:
    if isinstance(e, Col):
        return e.name
    if isinstance(e, Agg):
        if e.fn == "count_all":
            return "count"
        base = _default_name(e.arg, i) if isinstance(e.arg, Col) \
            else f"expr{i}"
        fn = {"mean": "avg"}.get(e.fn, e.fn)
        return f"{base}_{fn}" if isinstance(e.arg, Col) else fn
    return f"expr{i}"


def execute_sql(tables: Dict[str, Table], query: str) -> Table:
    """Parse and execute one SELECT statement against `tables`."""
    p = _Parser(_tokenize(query))
    p.expect("kw", "select")
    distinct = p.accept("kw", "distinct") is not None
    items = _select_items(p)
    p.expect("kw", "from")
    tname = p.expect("id")[1]
    if tname not in tables:
        raise ArrowInvalid(f"no such table {tname!r}")
    t = tables[tname]
    aliases: Dict[str, str] = {}
    suffixes: Dict[str, str] = {}
    if p.peek()[0] == "id":          # FROM t alias
        aliases[p.next()[1]] = tname

    # JOIN
    while True:
        how = "inner"
        if p.accept("kw", "left"):
            p.expect("kw", "join")
            how = "left"
        elif p.accept("kw", "inner"):
            p.expect("kw", "join")
        elif p.accept("kw", "join"):
            pass
        else:
            break
        rname = p.expect("id")[1]
        if rname not in tables:
            raise ArrowInvalid(f"no such table {rname!r}")
        rt = tables[rname]
        if p.peek()[0] == "id" and p.peek()[1] != "on":
            aliases[p.next()[1]] = rname
        p.expect("kw", "on")
        cond = p.expr()
        if not (isinstance(cond, Bin) and cond.op == "="
                and isinstance(cond.left, Col)
                and isinstance(cond.right, Col)):
            raise ArrowInvalid("JOIN ON must be t1.a = t2.b")
        a, b = cond.left, cond.right

        # decide which side each column belongs to: explicit table
        # qualifiers (resolved through aliases) win; fall back to
        # unqualified-name membership
        def _side(c):
            if c.table is None:
                return None
            return "r" if aliases.get(c.table, c.table) == rname else "l"

        sa, sb = _side(a), _side(b)
        if sa == "r" or sb == "l":
            a, b = b, a              # a = left column, b = right column
        elif sa is None and sb is None and not (
                a.name in t.column_names
                and b.name in rt.column_names):
            a, b = b, a

        def _resolve_left(c):
            # a qualified left ref may carry an earlier join's suffix
            cands = [c.name]
            if c.table is not None:
                sfx = suffixes.get(aliases.get(c.table, c.table))
                if sfx:
                    cands.insert(0, f"{c.name}{sfx}")
            for cand in cands:
                if cand in t.column_names:
                    return cand
            return c.name

        l_on, r_on = _resolve_left(a), b.name
        from .ops.join import join as join_op
        t = join_op(t, rt, [l_on], how=how, right_on=[r_on])
        suffixes[rname] = "_right"     # colliding right columns

    where = p.expr() if p.accept("kw", "where") else None
    def colref():
        """id [. id] -> resolved column name (aliases + join suffixes,
        same candidate order as _Evaluator.col)."""
        name = p.expect("id")[1]
        tbl = None
        if p.accept("op", "."):
            tbl, name = name, p.expect("id")[1]
        cands = [name]
        if tbl is not None:
            tn = aliases.get(tbl, tbl)
            cands = [f"{tn}.{name}", name]
            sfx = suffixes.get(tn)
            if sfx:
                cands.insert(0, f"{name}{sfx}")
        for c in cands:
            if c in t.column_names:
                return c
        return name

    group = None
    if p.accept("kw", "group"):
        p.expect("kw", "by")
        group = [colref()]
        while p.accept("op", ","):
            group.append(colref())
    having = p.expr() if p.accept("kw", "having") else None
    order = []
    if p.accept("kw", "order"):
        p.expect("kw", "by")
        while True:
            oe = p.expr()
            desc = False
            if p.accept("kw", "desc"):
                desc = True
            else:
                p.accept("kw", "asc")
            order.append((oe, desc))
            if not p.accept("op", ","):
                break
    limit = offset = None
    if p.accept("kw", "limit"):
        limit = int(p.expect("num")[1])
        if p.accept("kw", "offset"):
            offset = int(p.expect("num")[1])
    p.expect("end")

    if where is not None:
        from .ops.filter import filter_table
        t = filter_table(t, _Evaluator(t, aliases, suffixes).eval(where))

    has_agg = items is not None and any(_is_agg(e) for e, _ in items)
    if group and not has_agg:
        raise ArrowInvalid("GROUP BY requires aggregates in SELECT")

    pre_t = None                 # row-aligned source for ORDER BY names
    hidden: List[str] = []
    if has_agg:
        t, having, hidden = _aggregate(t, aliases, suffixes, items,
                                       group or [], having)
    elif items is not None:
        ev = _Evaluator(t, aliases, suffixes)
        cols, fields = [], []
        for i, (e, alias) in enumerate(items):
            c = ev.eval(e)
            name = alias or _default_name(e, i)
            cols.append(c)
            fields.append(dt.Field(name, c.dtype))
        pre_t = t
        t = Table(tuple(cols), dt.Schema(tuple(fields)))

    if having is not None:
        from .ops.filter import filter_table
        t = filter_table(t, _Evaluator(t, {}).eval(having))
    if hidden:                   # HAVING-only aggregates: drop them
        keep = [i for i, f in enumerate(t.schema.fields)
                if f.name not in hidden]
        t = Table(tuple(t.columns[i] for i in keep),
                  dt.Schema(tuple(t.schema.fields[i] for i in keep)))

    if distinct:
        from .ops.groupby import group_by
        t = group_by(t, list(t.column_names), [])

    if order:
        # keys resolve against the SELECT output first, then the
        # row-aligned source (SQL lets ORDER BY use dropped columns)
        from .ops.sort import SortColumn, SortOptions, lexsort_to_indices
        from .ops.take import take_table
        sort_cols = []
        for oe, desc in order:
            if not isinstance(oe, Col):
                raise ArrowInvalid("ORDER BY supports columns only")
            if oe.name in t.column_names:
                c = t.column(oe.name)
            elif pre_t is not None and oe.name in pre_t.column_names:
                c = pre_t.column(oe.name)
            else:
                raise ArrowInvalid(f"no such column {oe.name!r}")
            sort_cols.append(SortColumn(c,
                                        SortOptions(descending=desc)))
        idx = lexsort_to_indices(sort_cols)
        t = take_table(t, idx)

    if offset:
        t = t.slice(min(offset, t.num_rows),
                    max(t.num_rows - offset, 0))
    if limit is not None:
        t = t.slice(0, min(limit, t.num_rows))
    return t


def _rewrite_aggs(e, add_agg):
    """Replace every Agg node with a Col reference to its aggregate
    output column (HAVING over aggregate expressions)."""
    if isinstance(e, Agg):
        return Col(None, add_agg(e))
    if isinstance(e, Bin):
        return Bin(e.op, _rewrite_aggs(e.left, add_agg),
                   _rewrite_aggs(e.right, add_agg))
    if isinstance(e, Un):
        return Un(e.op, _rewrite_aggs(e.operand, add_agg))
    if isinstance(e, Func):
        return Func(e.name, [_rewrite_aggs(a, add_agg) for a in e.args],
                    e.cast_to)
    if isinstance(e, InList):
        return InList(_rewrite_aggs(e.expr, add_agg), e.items, e.negated)
    return e


def _aggregate(t: Table, aliases, suffixes, items,
               group: List[str], having=None):
    """Lower an aggregate SELECT onto ops.group_by (grouped) or the
    whole-array aggregates (global).  -> (table, rewritten_having,
    hidden_names): aggregates referenced only by HAVING are computed
    as hidden columns the caller drops after filtering."""
    from .ops.groupby import AggSpec, group_by
    ev = _Evaluator(t, aliases, suffixes)

    # materialize aggregate ARGUMENT expressions as temp columns
    specs: List[AggSpec] = []
    out_plan = []                    # (kind, payload, name, agg_expr)
    tmp_cols: Dict[str, Column] = {}

    def arg_column(e, i):
        if isinstance(e, Col):
            # resolved name (qualified refs after a join carry join
            # suffixes — the raw name would aggregate the wrong column)
            return ev.col(e), ev.colname(e)
        name = f"__agg_arg{i}"
        tmp_cols[name] = ev.eval(e)
        return tmp_cols[name], name

    def add_spec(e, out_name, i):
        if e.fn == "count_all":
            specs.append(AggSpec(t.column_names[0], "count_all",
                                 name=out_name))
        else:
            _, tmp = arg_column(e.arg, i)
            specs.append(AggSpec(tmp, e.fn, name=out_name))

    for i, (e, alias) in enumerate(items):
        name = alias or _default_name(e, i)
        if isinstance(e, Col) and e.name in group:
            out_plan.append(("group", e.name, name, None))
            continue
        if isinstance(e, Agg):
            add_spec(e, f"__a{i}", i)
            out_plan.append(("agg", f"__a{i}", name, e))
            continue
        raise ArrowInvalid(
            "aggregate SELECT items must be group keys or aggregates")

    hidden: List[str] = []
    if having is not None and _is_agg(having):
        counter = [0]

        def add_agg(e):
            for kind, _, name, pe in out_plan:
                if kind == "agg" and pe == e:
                    return name      # reuse a SELECT aggregate
            hname = f"__h{counter[0]}"
            counter[0] += 1
            add_spec(e, hname, hname)
            out_plan.append(("agg", hname, hname, e))
            hidden.append(hname)
            return hname

        having = _rewrite_aggs(having, add_agg)

    if tmp_cols:
        cols = list(t.columns) + list(tmp_cols.values())
        fields = list(t.schema.fields) + \
            [dt.Field(n, c.dtype) for n, c in tmp_cols.items()]
        t = Table(tuple(cols), dt.Schema(tuple(fields)))

    if group:
        g = group_by(t, group, specs)
        cols, fields = [], []
        for kind, src, name, _ in out_plan:
            c = g.column(src)
            cols.append(c)
            fields.append(dt.Field(name, c.dtype))
        return (Table(tuple(cols), dt.Schema(tuple(fields))),
                having, hidden)

    # global aggregates
    from .ops import aggregate as agg_ops
    cols, fields = [], []
    for kind, src, name, e in out_plan:
        assert kind == "agg"
        if e.fn == "count_all":
            v = t.num_rows
        else:
            c = t.column(specs[[s.out_name for s in specs]
                               .index(src)].column)
            from .core.column import NullColumn
            if e.fn == "count":
                v = int(agg_ops.count(c))
            elif isinstance(c, NullColumn):
                v = None             # SUM/AVG/MIN/MAX of the null type
            elif e.fn == "mean":
                cnt = int(agg_ops.count(c))
                # AVG of zero non-null rows is NULL (Scalar.valid is the
                # null flag; .value is always a tensor, never None)
                v = (None if cnt == 0 else
                     float(np.asarray(agg_ops.sum_(c).value)) / cnt)
            else:
                r = getattr(agg_ops, {"sum": "sum_", "min": "min_",
                                      "max": "max_"}[e.fn])(c)
                v = None if r is None else r.as_py()
        col = make_col([v])
        cols.append(col)
        fields.append(dt.Field(name, col.dtype))
    return Table(tuple(cols), dt.Schema(tuple(fields))), having, hidden


# ---------------------------------------------------------------------------
# DML / DDL (the update-statement surface behind FlightSQL
# CommandStatementUpdate — arrow-flight/src/sql/server.rs:399 delegates
# the SQL itself to the application; this is that application side)
# ---------------------------------------------------------------------------

def _word(p: _Parser, w: str) -> bool:
    """Accept a case-insensitive bare word (DML verbs are not in the
    SELECT keyword set, so they arrive as `id` tokens)."""
    t = p.peek()
    if (t[0] == "id" and t[1].lower() == w) or t == ("kw", w):
        p.next()
        return True
    return False


def _expect_word(p: _Parser, w: str) -> None:
    if not _word(p, w):
        raise ArrowInvalid(
            f"SQL parse error: expected {w.upper()}, got {p.peek()!r}")


def _const_value(e):
    """Evaluate a VALUES-row expression to one python value by running
    the row evaluator over a one-row dummy table (so CAST, arithmetic
    and negation all work)."""
    dummy = Table.from_pydict({"__one": [0]})
    c = _Evaluator(dummy, {}).eval(e)
    vals = c.to_pylist()
    if len(vals) != 1:
        raise ArrowInvalid("VALUES expressions must be scalar")
    return vals[0]


def _typed_col(vals, dtype):
    """Python values -> Column of `dtype`, falling back to infer+cast
    for types make_col can't build directly from literals."""
    from .ops.cast import cast as cast_kernel
    try:
        return make_col(vals, dtype)
    except Exception:                  # noqa: BLE001
        return cast_kernel(make_col(vals), dtype)


def _mask_arrays(mask_col):
    """Bool predicate column -> (true&valid ndarray, count)."""
    m = np.asarray(mask_col.values).astype(bool)
    if getattr(mask_col, "validity", None) is not None:
        m = m & np.asarray(mask_col.validity).astype(bool)
    return m, int(np.count_nonzero(m))


def _select_tail(query: str) -> str:
    m = re.search(r"(?i)\bselect\b", query)
    if m is None:
        raise ArrowInvalid("expected SELECT")
    return query[m.start():]


def execute_sql_update(tables: Dict[str, Table], query: str
                       ) -> Tuple[Dict[str, Optional[Table]], int]:
    """Execute one DML/DDL statement against `tables`.

    Returns (mutations, record_count): mutations maps table name ->
    new Table (None = dropped); record_count is the DoPutUpdateResult
    count (rows inserted / matched / deleted; 0 for DDL).

    Grammar: INSERT INTO t [(cols)] VALUES (...)[, ...] | SELECT ...;
    UPDATE t SET c = expr [, ...] [WHERE pred];
    DELETE FROM t [WHERE pred];
    CREATE TABLE [IF NOT EXISTS] t (c TYPE [, ...]) | AS SELECT ...;
    DROP TABLE [IF EXISTS] t.
    """
    p = _Parser(_tokenize(query))

    if _word(p, "insert"):
        _expect_word(p, "into")
        tname = p.expect("id")[1]
        if tname not in tables:
            raise ArrowInvalid(f"no such table {tname!r}")
        target = tables[tname]
        names = list(target.column_names)
        if p.accept("op", "("):
            names = [p.expect("id")[1]]
            while p.accept("op", ","):
                names.append(p.expect("id")[1])
            p.expect("op", ")")
            for n in names:
                if n not in target.column_names:
                    raise ArrowInvalid(f"no such column {n!r}")
        if _word(p, "values"):
            rows = []
            while True:
                p.expect("op", "(")
                row = [_const_value(p.expr())]
                while p.accept("op", ","):
                    row.append(_const_value(p.expr()))
                p.expect("op", ")")
                if len(row) != len(names):
                    raise ArrowInvalid(
                        f"VALUES row has {len(row)} values, expected "
                        f"{len(names)}")
                rows.append(row)
                if not p.accept("op", ","):
                    break
            p.expect("end")
            by_name = {n: [r[i] for r in rows]
                       for i, n in enumerate(names)}
            cols = tuple(
                _typed_col(by_name.get(f.name, [None] * len(rows)),
                           f.dtype)
                for f in target.schema.fields)
            add = Table(cols, target.schema)
        else:
            sel = execute_sql(tables, _select_tail(query))
            if sel.num_columns != len(names):
                raise ArrowInvalid(
                    f"SELECT produces {sel.num_columns} columns, "
                    f"expected {len(names)}")
            from .ops.cast import cast as cast_kernel
            by_name = dict(zip(names, sel.columns))
            cols = []
            for f in target.schema.fields:
                if f.name in by_name:
                    c = by_name[f.name]
                    cols.append(c if c.dtype == f.dtype
                                else cast_kernel(c, f.dtype))
                else:
                    cols.append(_typed_col([None] * sel.num_rows,
                                           f.dtype))
            add = Table(tuple(cols), target.schema)
        from .ops.concat import concat_tables
        new = add if target.num_rows == 0 else \
            concat_tables([target, add])
        return {tname: new}, add.num_rows

    if _word(p, "update"):
        tname = p.expect("id")[1]
        if tname not in tables:
            raise ArrowInvalid(f"no such table {tname!r}")
        t = tables[tname]
        _expect_word(p, "set")
        sets = []
        while True:
            cname = p.expect("id")[1]
            if cname not in t.column_names:
                raise ArrowInvalid(f"no such column {cname!r}")
            p.expect("op", "=")
            sets.append((cname, p.expr()))
            if not p.accept("op", ","):
                break
        where = p.expr() if p.accept("kw", "where") else None
        p.expect("end")
        ev = _Evaluator(t, {})
        from .ops.cast import cast as cast_kernel
        from .ops.select_misc import zip_ as zip_kernel
        if where is not None:
            mcol = ev.eval(where)
            m, count = _mask_arrays(mcol)
            mask = make_col(m.tolist(), dt.bool_)
        else:
            mask, count = None, t.num_rows
        updates = {}
        for cname, e in sets:
            newc = ev.eval(e)
            old = t.column(cname)
            if newc.dtype != old.dtype:
                newc = cast_kernel(newc, old.dtype)
            updates[cname] = newc if mask is None \
                else zip_kernel(mask, newc, old)
        cols = tuple(updates.get(f.name, c)
                     for f, c in zip(t.schema.fields, t.columns))
        return {tname: Table(cols, t.schema)}, count

    if _word(p, "delete"):
        p.expect("kw", "from")
        tname = p.expect("id")[1]
        if tname not in tables:
            raise ArrowInvalid(f"no such table {tname!r}")
        t = tables[tname]
        where = p.expr() if p.accept("kw", "where") else None
        p.expect("end")
        if where is None:
            return {tname: t.slice(0, 0)}, t.num_rows
        m, count = _mask_arrays(_Evaluator(t, {}).eval(where))
        from .ops.filter import filter_table
        keep = make_col((~m).tolist(), dt.bool_)
        return {tname: filter_table(t, keep)}, count

    if _word(p, "create"):
        _expect_word(p, "table")
        if_not_exists = False
        if _word(p, "if"):
            p.expect("kw", "not")
            _expect_word(p, "exists")
            if_not_exists = True
        tname = p.expect("id")[1]
        if tname in tables:
            if if_not_exists:
                return {}, 0
            raise ArrowInvalid(f"table {tname!r} already exists")
        if p.accept("kw", "as"):
            sel = execute_sql(tables, _select_tail(query))
            return {tname: sel}, sel.num_rows
        p.expect("op", "(")
        fields = []
        while True:
            cname = p.expect("id")[1]
            tok = p.next()
            if tok[0] not in ("id", "kw"):
                raise ArrowInvalid(
                    f"SQL parse error: expected type, got {tok!r}")
            fields.append(dt.Field(cname, _sql_type(tok[1])))
            if not p.accept("op", ","):
                break
        p.expect("op", ")")
        p.expect("end")
        from .io.integration_json import _empty_col
        from .core.column import NullColumn
        cols = tuple(NullColumn(0) if f.dtype.is_null
                     else _empty_col(f.dtype) for f in fields)
        return {tname: Table(cols, dt.Schema(tuple(fields)))}, 0

    if _word(p, "drop"):
        _expect_word(p, "table")
        if_exists = False
        if _word(p, "if"):
            _expect_word(p, "exists")
            if_exists = True
        tname = p.expect("id")[1]
        p.expect("end")
        if tname not in tables:
            if if_exists:
                return {}, 0
            raise ArrowInvalid(f"no such table {tname!r}")
        return {tname: None}, 0

    raise ArrowInvalid(
        "expected INSERT / UPDATE / DELETE / CREATE / DROP")


def bind_sql_params(query: str, row) -> str:
    """Substitute positional `?` placeholders with SQL literals (the
    parameter-binding convention FlightSQL prepared statements carry in
    their do_put parameter batch; sql/client.rs bind contract)."""
    out = []
    it = iter(row)
    i = 0
    while i < len(query):
        ch = query[i]
        if ch == "'":                  # skip string literals
            j = i + 1
            while j < len(query):
                if query[j] == "'" and j + 1 < len(query) \
                        and query[j + 1] == "'":
                    j += 2
                    continue
                if query[j] == "'":
                    break
                j += 1
            out.append(query[i:j + 1])
            i = j + 1
            continue
        if ch == "?":
            try:
                v = next(it)
            except StopIteration:
                raise ArrowInvalid(
                    "not enough parameters for placeholders") from None
            if v is None:
                out.append("NULL")
            elif isinstance(v, bool):
                out.append("TRUE" if v else "FALSE")
            elif isinstance(v, str):
                out.append("'" + v.replace("'", "''") + "'")
            else:
                out.append(repr(v))
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)
