"""Milvus boolean filter-expression compiler → Spark ``Column`` predicates.

Milvus clients filter with a string expression language — ``query(expr=...)``
and ``search(filter=...)``. The reference's own e2e verification drives
deletes and row checks through exactly these strings
(tests/testcases/test_cdc_e2e.py:103-107 ``int64 in [0..3000]``;
tests/scripts/verify_delete.py), so a user switching from the replicated
Milvus target to this engine needs those same strings to evaluate
identically here. This module compiles the public grammar (milvus.io
"boolean expression rules" / "Filtering explained") into pure Spark column
expressions: the parse is driver-side (strings are tiny), evaluation is
JVM-side builtins, and the resulting predicates are ordinary Catalyst
filters — pushdown/pruning-eligible exactly like hand-written ones
(asserted in tests/test_plans.py).

Grammar (precedence low → high)::

    expr   := or
    or     := and  (("||" | "or") and)*
    and    := not  (("&&" | "and") not)*
    not    := ("not" | "!") not | cmp
    cmp    := sum (CMPOP sum)*                -- chaining allowed: the
              Milvus binary-range shape `0 < x <= 10` ANDs adjacent pairs
            | sum ["not"] "in" "[" literals "]"
            | sum ["not"] "like" STRING
            | sum "is" ["not"] "null"         -- nullable fields (Milvus 2.5)
    sum    := term (("+" | "-") term)*
    term   := factor (("*" | "/" | "%") factor)*
    factor := ("-" | "+") factor | power
    power  := atom ["**" factor]              -- right-associative
    atom   := NUMBER | STRING | true | false
            | "exists" path
            | NAME "(" args ")"               -- builtin calls below
            | path
            | "(" expr ")"
    path   := NAME ("[" (STRING | INT) "]")*

Builtin calls: ``array_contains / array_contains_all / array_contains_any /
array_length`` over ARRAY fields; ``json_contains / json_contains_all /
json_contains_any`` over JSON paths; ``text_match(field, 'a b c')``
(OR-of-terms over the shared alnum analyzer) and
``phrase_match(field, 'w1 w2')`` (consecutive terms, slop=0) over text
fields; ``random_sample(p)`` (Milvus 2.6) as a deterministic md5-nibble
keep-gate over the caller-declared ``sample_key`` column.

Typing rules (JSON is stringly-typed on extraction):

- a JSON path compared against a literal is cast to the literal's type
  (int → bigint, float → double, bool → boolean, else string), matching
  Milvus's dynamic-typed JSON comparisons for homogeneously-typed keys;
- an identifier not present in ``fields`` compiles to dynamic-field access
  ``$meta["name"]`` when a ``meta_col`` is provided
  (``enable_dynamic_field`` semantics), else it is a compile error;
- array subscripts are 0-based (Milvus ARRAY access), mapped onto Spark's
  0-based ``Column.getItem``.

``field is [not] null`` (Milvus 2.5 nullable fields) compiles to
Spark's SQL NULL tests; for a JSON path it is true when the key is
missing OR holds an explicit JSON null (both extract to NULL).

Out of scope (documented, not silently wrong): JSON paths of
heterogeneous runtime type per row, and template/parameterized exprs —
callers substitute params before compiling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExprError(ValueError):
    """Raised on tokenize/parse/compile failure, with position context."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\*\*|&&|\|\||==|!=|>=|<=|[-+*/%()\[\],><!])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "like", "true", "false", "exists", "is", "null"}

_CMP_OPS = {"==", "!=", ">", ">=", "<", "<="}


@dataclass
class _Tok:
    kind: str  # num | str | name | op | kw | end
    text: str
    pos: int


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ExprError(f"bad character {src[i]!r} at position {i} in {src!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.lower() in _KEYWORDS:
            toks.append(_Tok("kw", text.lower(), m.start()))
        else:
            toks.append(_Tok(kind, text, m.start()))
    toks.append(_Tok("end", "", len(src)))
    return toks


#: Standard escapes Milvus string literals carry (Go-style); any other
#: backslashed char unescapes to itself.
_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: _STR_ESCAPES.get(m.group(1), m.group(1)), body)


@dataclass
class _Val:
    """A compiled operand: the Column plus enough type context to apply the
    JSON stringly-typing rule at comparison sites."""

    col: Column
    is_json: bool = False  # extracted via get_json_object → string Column
    json_src: Column | None = None  # the JSON document column (for *_contains)
    json_path: str | None = None  # '$.key' path inside json_src
    lit: object | None = None  # python literal value when this is a literal
    is_lit: bool = False


def _lit_cast_type(v: object) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    return "string"


def _coerce_pair(a: _Val, b: _Val) -> tuple[Column, Column]:
    """Apply the JSON typing rule: a JSON-extracted string column compared
    against a typed literal (or typed column) is cast to that type."""
    ca, cb = a.col, b.col
    if a.is_json and not b.is_json:
        ca = ca.cast(_lit_cast_type(b.lit) if b.is_lit else "double")
    if b.is_json and not a.is_json:
        cb = cb.cast(_lit_cast_type(a.lit) if a.is_lit else "double")
    return ca, cb


class _Parser:
    """Single-pass recursive descent; compiles to Columns as it parses."""

    def __init__(
        self,
        src: str,
        fields: dict[str, Column],
        meta_col: Column | None,
        json_fields: frozenset[str],
        sample_key: Column | None = None,
    ):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self.fields = fields
        self.meta_col = meta_col
        self.json_fields = json_fields
        self.sample_key = sample_key

    # -- token helpers ------------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            want = text or kind
            raise ExprError(
                f"expected {want!r} at position {t.pos}, got {t.text!r} in {self.src!r}"
            )
        return t

    def at_op(self, *texts: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.text in texts

    def at_kw(self, *texts: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text in texts

    # -- grammar ------------------------------------------------------------
    def parse(self) -> Column:
        col = self.or_()
        t = self.peek()
        if t.kind != "end":
            raise ExprError(
                f"trailing input at position {t.pos}: {t.text!r} in {self.src!r}"
            )
        return col

    def or_(self) -> Column:
        left = self.and_()
        while self.at_op("||") or self.at_kw("or"):
            self.next()
            left = left | self.and_()
        return left

    def and_(self) -> Column:
        left = self.not_()
        while self.at_op("&&") or self.at_kw("and"):
            self.next()
            left = left & self.not_()
        return left

    def not_(self) -> Column:
        if self.at_kw("not") or self.at_op("!"):
            self.next()
            return ~self.not_()
        return self.cmp()

    def cmp(self) -> Column:
        left = self.sum_()
        # in / not in / like / not like
        negate = False
        if self.at_kw("not"):
            save = self.i
            self.next()
            if self.at_kw("in", "like"):
                negate = True
            else:
                self.i = save
        if self.at_kw("in"):
            self.next()
            vals = self.literal_list()
            types = {_lit_cast_type(v) for v in vals}
            lc = left.col
            if left.is_json:
                lc = lc.cast(next(iter(types)) if len(types) == 1 else "string")
            col = lc.isin(vals)
            return ~col if negate else col
        if self.at_kw("like"):
            self.next()
            t = self.expect("str")
            lc = left.col
            if left.is_json:
                lc = lc.cast("string")
            # Milvus's grammar wildcards ONLY '%'; Spark LIKE also treats
            # '_' as any-single-char, so literal underscores (ubiquitous in
            # ids) must be escaped and the pattern compiled with ESCAPE
            pat = _unquote(t.text).replace("\\", "\\\\").replace("_", "\\_")
            col = F.like(lc, F.lit(pat), F.lit("\\"))
            return ~col if negate else col
        if not negate and self.at_kw("is"):
            # nullable-field test (Milvus 2.5): `f is [not] null`; a JSON
            # path extracts to NULL for missing keys AND explicit JSON
            # nulls, so both count as null here
            self.next()
            neg = False
            if self.at_kw("not"):
                self.next()
                neg = True
            t = self.next()
            if not (t.kind == "kw" and t.text == "null"):
                raise ExprError(
                    f"expected 'null' at position {t.pos} in {self.src!r}"
                )
            return left.col.isNotNull() if neg else left.col.isNull()
        if negate:
            t = self.peek()
            raise ExprError(
                f"'not' must precede 'in' or 'like' at position {t.pos} in {self.src!r}"
            )
        # (possibly chained) comparisons: a < b < c → (a<b) AND (b<c)
        if not (self.at_op(*_CMP_OPS)):
            # bare value in boolean position (e.g. a standalone bool field)
            return left.col
        pred: Column | None = None
        prev = left
        while self.at_op(*_CMP_OPS):
            op = self.next().text
            right = self.sum_()
            ca, cb = _coerce_pair(prev, right)
            piece = {
                "==": ca == cb,
                "!=": ca != cb,
                ">": ca > cb,
                ">=": ca >= cb,
                "<": ca < cb,
                "<=": ca <= cb,
            }[op]
            pred = piece if pred is None else (pred & piece)
            prev = right
        return pred

    def sum_(self) -> _Val:
        left = self.term()
        while self.at_op("+", "-"):
            op = self.next().text
            right = self.term()
            ca, cb = _coerce_pair(left, right)
            left = _Val(ca + cb if op == "+" else ca - cb)
        return left

    def term(self) -> _Val:
        left = self.factor()
        while self.at_op("*", "/", "%"):
            op = self.next().text
            right = self.factor()
            ca, cb = _coerce_pair(left, right)
            if op == "*":
                left = _Val(ca * cb)
            elif op == "/":
                left = _Val(ca / cb)
            else:
                left = _Val(ca % cb)
        return left

    def factor(self) -> _Val:
        if self.at_op("-", "+"):
            op = self.next().text
            v = self.factor()
            c = v.col.cast("double") if v.is_json else v.col
            if op == "-":
                if v.is_lit and isinstance(v.lit, (int, float)):
                    return _Val(F.lit(-v.lit), lit=-v.lit, is_lit=True)
                return _Val(-c)
            return _Val(c, lit=v.lit, is_lit=v.is_lit)
        return self.power()

    def power(self) -> _Val:
        base = self.atom()
        if self.at_op("**"):
            self.next()
            exp = self.factor()  # right-associative
            cb, ce = _coerce_pair(base, exp)
            return _Val(F.pow(cb, ce))
        return base

    def literal_list(self) -> list:
        self.expect("op", "[")
        vals: list = []
        if not self.at_op("]"):
            vals.append(self.literal())
            while self.at_op(","):
                self.next()
                vals.append(self.literal())
        self.expect("op", "]")
        return vals

    def literal(self):
        t = self.next()
        if t.kind == "num":
            return float(t.text) if ("." in t.text or "e" in t.text.lower()) else int(t.text)
        if t.kind == "str":
            return _unquote(t.text)
        if t.kind == "kw" and t.text in ("true", "false"):
            return t.text == "true"
        if t.kind == "op" and t.text == "-":
            v = self.literal()
            if not isinstance(v, (int, float)):
                raise ExprError(f"cannot negate {v!r} at position {t.pos}")
            return -v
        raise ExprError(
            f"expected literal at position {t.pos}, got {t.text!r} in {self.src!r}"
        )

    def atom(self) -> _Val:
        t = self.peek()
        if t.kind == "num":
            self.next()
            v = float(t.text) if ("." in t.text or "e" in t.text.lower()) else int(t.text)
            return _Val(F.lit(v), lit=v, is_lit=True)
        if t.kind == "str":
            self.next()
            v = _unquote(t.text)
            return _Val(F.lit(v), lit=v, is_lit=True)
        if t.kind == "kw" and t.text in ("true", "false"):
            self.next()
            v = t.text == "true"
            return _Val(F.lit(v), lit=v, is_lit=True)
        if t.kind == "kw" and t.text == "exists":
            self.next()
            v = self.path()
            if not v.is_json:
                raise ExprError(
                    f"'exists' needs a JSON path at position {t.pos} in {self.src!r}"
                )
            return _Val(v.col.isNotNull())
        if t.kind == "name":
            # call?
            if self.toks[self.i + 1].kind == "op" and self.toks[self.i + 1].text == "(":
                return self.call()
            return self.path()
        if t.kind == "op" and t.text == "(":
            self.next()
            col = self.or_()
            self.expect("op", ")")
            return _Val(col)
        raise ExprError(
            f"unexpected {t.text!r} at position {t.pos} in {self.src!r}"
        )

    def path(self) -> _Val:
        t = self.expect("name")
        name = t.text
        if name in self.json_fields:
            base = self.fields[name]
            jpath = "$"
            v = _Val(base, is_json=False, json_src=base, json_path=jpath)
            json_doc = True
        elif name in self.fields:
            v = _Val(self.fields[name])
            json_doc = False
        elif self.meta_col is not None:
            # dynamic field: $meta["name"] (enable_dynamic_field)
            v = _Val(
                F.get_json_object(self.meta_col, f"$.{name}"),
                is_json=True,
                json_src=self.meta_col,
                json_path=f"$.{name}",
            )
            json_doc = False
        else:
            raise ExprError(
                f"unknown field {name!r} at position {t.pos} (no meta_col for "
                f"dynamic fields) in {self.src!r}"
            )
        while self.at_op("["):
            self.next()
            k = self.next()
            self.expect("op", "]")
            if k.kind == "str":
                key = _unquote(k.text)
                if json_doc or v.is_json:
                    jpath = (v.json_path or "$") + f".{key}"
                    v = _Val(
                        F.get_json_object(v.json_src, jpath),
                        is_json=True,
                        json_src=v.json_src,
                        json_path=jpath,
                    )
                    json_doc = False
                else:
                    v = _Val(v.col.getItem(key))  # map access
            elif k.kind == "num" and "." not in k.text:
                idx = int(k.text)
                if json_doc or v.is_json:
                    jpath = (v.json_path or "$") + f"[{idx}]"
                    v = _Val(
                        F.get_json_object(v.json_src, jpath),
                        is_json=True,
                        json_src=v.json_src,
                        json_path=jpath,
                    )
                    json_doc = False
                else:
                    # 0-based ARRAY access; F.get (not getItem) so an
                    # out-of-bounds row yields NULL → no match, never an
                    # ANSI runtime error (Milvus: missing element ≠ error)
                    v = _Val(F.get(v.col, idx))
            else:
                raise ExprError(
                    f"bad subscript {k.text!r} at position {k.pos} in {self.src!r}"
                )
        if json_doc:
            # whole JSON field used as a value: expose as string
            v = _Val(v.col, is_json=True, json_src=v.json_src, json_path="$")
        return v

    def call(self) -> _Val:
        t = self.expect("name")
        fn = t.text.lower()
        self.expect("op", "(")
        args: list = []
        if not self.at_op(")"):
            args.append(self.call_arg())
            while self.at_op(","):
                self.next()
                args.append(self.call_arg())
        self.expect("op", ")")

        def need(n: int):
            if len(args) != n:
                raise ExprError(
                    f"{fn} takes {n} argument(s), got {len(args)} in {self.src!r}"
                )

        if fn in ("array_contains", "json_contains"):
            need(2)
            return _Val(self._contains(args[0], args[1], fn))
        if fn in ("array_contains_all", "json_contains_all"):
            need(2)
            return _Val(self._contains_multi(args[0], args[1], fn, all_of=True))
        if fn in ("array_contains_any", "json_contains_any"):
            need(2)
            return _Val(self._contains_multi(args[0], args[1], fn, all_of=False))
        if fn == "array_length":
            need(1)
            v = args[0]
            if isinstance(v, _Val) and not v.is_json:
                return _Val(F.size(v.col))
            if isinstance(v, _Val) and v.is_json:
                # length of a JSON array at the path
                return _Val(F.json_array_length(v.col))
            raise ExprError(f"array_length needs a field in {self.src!r}")
        if fn == "text_match":
            need(2)
            return _Val(self._text_match(args[0], args[1]))
        if fn == "phrase_match":
            if len(args) not in (2, 3):
                raise ExprError(
                    f"phrase_match takes 2 or 3 arguments, got {len(args)} in {self.src!r}"
                )
            slop = args[2] if len(args) == 3 else 0
            return _Val(self._phrase_match(args[0], args[1], slop))
        if fn == "random_sample":
            need(1)
            return _Val(self._random_sample(args[0], t.pos))
        if fn == "st_within":
            need(2)
            return _Val(self._st_within(args[0], args[1], t.pos))
        if fn == "st_dwithin":
            need(3)
            return _Val(self._st_dwithin(args[0], args[1], args[2], t.pos))
        raise ExprError(f"unknown function {fn!r} at position {t.pos} in {self.src!r}")

    def _geo_xy(self, field, pos: int):
        from milvus_cdc_spark.functions.geo import (
            parse_wkt_point_x,
            parse_wkt_point_y,
        )

        if not isinstance(field, _Val) or field.is_json:
            raise ExprError(
                f"geo predicate needs a WKT field at position {pos} in {self.src!r}"
            )
        return parse_wkt_point_x(field.col), parse_wkt_point_y(field.col)

    def _st_within(self, field, wkt, pos: int) -> Column:
        """Milvus 2.6 ST_WITHIN(point_field, 'POLYGON ((...))'): the
        entity point lies inside the literal query polygon — compiled
        to the unrolled even-odd ray cast (functions/geo), so the
        polygon's edges become plan literals exactly like an IN-list."""
        import re as _re

        from milvus_cdc_spark.functions.geo import st_contains_polygon

        if not isinstance(wkt, str) or not wkt.strip().upper().startswith("POLYGON"):
            raise ExprError(
                f"st_within needs a POLYGON WKT literal at position {pos} "
                f"in {self.src!r}"
            )
        pairs = _re.findall(r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)", wkt)
        verts = [(float(a), float(b)) for a, b in pairs]
        # WKT rings repeat the first vertex as the last — drop the closer
        if len(verts) >= 2 and verts[0] == verts[-1]:
            verts = verts[:-1]
        if len(verts) < 3:
            raise ExprError(
                f"st_within polygon needs >= 3 vertices at position {pos} "
                f"in {self.src!r}"
            )
        x, y = self._geo_xy(field, pos)
        return st_contains_polygon(x, y, verts)

    def _st_dwithin(self, field, wkt, radius, pos: int) -> Column:
        """Milvus 2.6 ST_DWITHIN(point_field, 'POINT (cx cy)', r):
        planar distance-within, squared-compare (no sqrt)."""
        import re as _re

        from milvus_cdc_spark.functions.geo import st_dwithin

        if not isinstance(radius, (int, float)) or isinstance(radius, bool):
            raise ExprError(
                f"st_dwithin needs a numeric radius at position {pos} in {self.src!r}"
            )
        m = _re.match(
            r"\s*POINT\s*\(\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s*\)\s*",
            wkt if isinstance(wkt, str) else "",
            _re.IGNORECASE,
        )
        if not m:
            raise ExprError(
                f"st_dwithin needs a POINT WKT literal at position {pos} "
                f"in {self.src!r}"
            )
        x, y = self._geo_xy(field, pos)
        return st_dwithin(x, y, float(m.group(1)), float(m.group(2)), float(radius))

    def _random_sample(self, p, pos: int) -> Column:
        """Milvus 2.6 RANDOM_SAMPLE(p): keep ~fraction p of the rows
        that pass the rest of the filter. Milvus samples with an RNG per
        query; this engine substitutes the deterministic md5-nibble gate
        (``corpus.portable_nibble_hash % 1000 < round(p*1000)``) over
        the caller-declared ``sample_key`` — the same documented
        determinism trade every sampling operator here makes, so the
        result is reproducible and oracle-checkable. Resolution is 1‰,
        matching the stratified-mixing gate."""
        from milvus_cdc_spark.analytics.corpus import sample_gate

        if not isinstance(p, (int, float)) or isinstance(p, bool) or not (
            0 < float(p) < 1
        ):
            raise ExprError(
                f"random_sample needs a literal fraction in (0, 1) at position "
                f"{pos} in {self.src!r}"
            )
        if self.sample_key is None:
            raise ExprError(
                f"random_sample at position {pos} needs compile_expr("
                f"sample_key=...) — no row-identity column was provided"
            )
        return sample_gate(self.sample_key, F.lit(int(round(float(p) * 1000))))

    def _match_args(self, field, query, fn: str):
        from milvus_cdc_spark.functions.text import word_tokens

        if not isinstance(field, _Val) or not isinstance(query, str):
            raise ExprError(f"{fn}(field, 'terms') expected in {self.src!r}")
        fc = field.col.cast("string") if field.is_json else field.col
        terms = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]
        if not terms:
            raise ExprError(f"{fn} needs a non-empty query in {self.src!r}")
        return word_tokens(fc), terms

    def _text_match(self, field, query) -> Column:
        """Milvus TEXT_MATCH(field, 'a b c'): true when the analyzed text
        contains ANY query term (Milvus ORs multi-term queries); the
        analyzer is the shared alnum-run word_tokens, so this predicate
        agrees row-for-row with the posting-list retrieval in
        analytics.textrank."""
        toks, terms = self._match_args(field, query, "text_match")
        return F.arrays_overlap(toks, F.array(*[F.lit(t) for t in terms]))

    def _phrase_match(self, field, query, slop) -> Column:
        """Milvus PHRASE_MATCH(field, 'w1 w2', slop=0): the terms occur
        consecutively in analyzer order. Compiled as a substring test on
        the space-rejoined token stream — identical semantics to the
        positional-posting join (textrank.phrase_match), pure column expr.
        Only slop=0 compiles; sloppy matching needs the positional index
        (analytics.textrank), not a row predicate."""
        toks, terms = self._match_args(field, query, "phrase_match")
        if slop != 0:
            raise ExprError(
                "phrase_match slop > 0 is not supported in filter expressions; "
                "use analytics.textrank.phrase_match posting-list retrieval"
            )
        stream = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
        return stream.contains(" " + " ".join(terms) + " ")

    def call_arg(self):
        t = self.peek()
        if t.kind == "op" and t.text == "[":
            return self.literal_list()
        if t.kind in ("num", "str") or (t.kind == "kw" and t.text in ("true", "false")):
            return self.literal()
        if t.kind == "op" and t.text == "-":
            return self.literal()
        return self.path()

    def _json_elems(self, v: _Val, elem_type: str) -> Column:
        """JSON array at path → typed Spark array (for *_contains)."""
        return F.from_json(v.col, f"array<{elem_type}>")

    def _contains(self, field, value, fn: str) -> Column:
        if not isinstance(field, _Val) or isinstance(value, _Val):
            raise ExprError(f"{fn}(field, literal) expected in {self.src!r}")
        if field.is_json:
            arr = self._json_elems(field, _lit_cast_type(value))
            return F.array_contains(arr, F.lit(value))
        return F.array_contains(field.col, F.lit(value))

    def _contains_multi(self, field, values, fn: str, all_of: bool) -> Column:
        if not isinstance(field, _Val) or not isinstance(values, list):
            raise ExprError(f"{fn}(field, [literals]) expected in {self.src!r}")
        if not values:
            raise ExprError(f"{fn} needs a non-empty literal list in {self.src!r}")
        parts = [self._contains(field, v, fn) for v in values]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if all_of else (out | p)
        return out


def compile_expr(
    expr: str,
    fields: dict[str, Column] | DataFrame,
    meta_col: Column | None = None,
    json_fields: tuple[str, ...] = (),
    sample_key: Column | None = None,
) -> Column:
    """Compile a Milvus filter-expression string to a Spark boolean Column.

    ``fields`` maps declared field names to their Columns (a DataFrame is
    accepted and uses its columns). ``json_fields`` names the fields whose
    Column holds a JSON document string (subscripts become JSON paths with
    typed casts at comparison sites). Identifiers not in ``fields`` resolve
    through ``meta_col`` as dynamic fields (``$meta["name"]``), matching
    ``enable_dynamic_field``; without a ``meta_col`` they are compile
    errors, never silent nulls.

    A syntactically-valid but non-boolean expression (e.g. ``size + 1``)
    compiles to its value Column; Spark's analyzer rejects it at
    ``filter()`` time — a bare boolean field is legal in boolean position,
    so booleanness is a type question the parser cannot decide alone.
    """
    if isinstance(fields, DataFrame):
        fields = {c: fields[c] for c in fields.columns}
    p = _Parser(expr, fields, meta_col, frozenset(json_fields), sample_key)
    out = p.parse()
    return out if isinstance(out, Column) else out.col


def render_expr_template(expr: str, params: dict) -> str:
    """pymilvus parameterized-expression parity: substitute ``{name}``
    placeholders with typed literals before compiling — the client-side
    half of ``client.query(filter="id in {ids}", filter_params={"ids":
    [1, 2]})``. Values render into the grammar this module parses:

    - str → double-quoted with ``\\`` and ``\"`` escaped (Go-style,
      matching the string-literal rules the parser implements)
    - bool → ``true`` / ``false`` (checked before int: bool is an int
      subclass in Python)
    - int / float → decimal literal
    - list/tuple → ``[item, item, ...]`` rendered recursively

    Unknown placeholders and unused params both raise — a typo'd
    parameter must never silently compile into a different filter.
    """
    import re as _re

    def render(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            escaped = v.replace("\\", "\\\\").replace('"', '\\"')
            return f'"{escaped}"'
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(render(x) for x in v) + "]"
        raise ExprError(f"unsupported template param type: {type(v).__name__}")

    used: set[str] = set()

    def sub(m) -> str:
        name = m.group(1)
        if name not in params:
            raise ExprError(f"missing template param {name!r} in {expr!r}")
        used.add(name)
        return render(params[name])

    out = _re.sub(r"\{([A-Za-z_][A-Za-z0-9_]*)\}", sub, expr)
    unused = set(params) - used
    if unused:
        raise ExprError(f"unused template params {sorted(unused)} in {expr!r}")
    return out
