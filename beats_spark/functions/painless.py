"""Painless-subset → Column compiler for module ingest pipelines.

Filebeat modules ship ES ingest-node programs whose ``script`` steps
and per-step ``if`` guards are written in painless (counted across
``/root/reference/filebeat/module/*/*/ingest/*.json``: 18 script
steps, 17 distinct ``if`` expressions). The full language is a JVM
scripting language; the module corpus uses a narrow, statically
compilable subset:

- straight-line ``ctx.path = expr`` assignments and ``+=`` concat;
- ``if / else if / else`` chains over equality / relational tests;
- ``ctx`` field paths (``?.`` null-safe spelling included),
  ``params.*`` constants, string/long/double/bool/null literals;
- ``Math.round(...)``, ``ctx.containsKey('k')``, nested
  ``ctx.a.containsKey('b')``, ``[:]`` empty-map creation;
- ``&&``, ``||``, ``!``, arithmetic ``* / + -``.

That subset is parsed here by a recursive-descent parser and compiled
by SYMBOLIC EXECUTION into per-target ``pyspark.sql.Column``
expressions: each assignment under a condition stack folds into
``F.when(cond, value).otherwise(previous)``, so an if/else chain
becomes one CASE expression per assigned field and the whole script
stays a single JVM-side projection — no Python runs per row.

Painless semantics preserved (and pinned by tests):

- ``==`` / ``!=`` are **null-safe object equality** (painless lowers
  them to ``Objects.equals``): ``null == null`` is true and
  ``null != 'x'`` is true → ``Column.eqNullSafe``, NOT SQL's
  three-valued ``=``.
- ``ctx.containsKey('k')`` is a per-document key test; in our
  flat-column data model a field is "present" when its column (or any
  ``k.``-prefixed subfield column) is non-null.
- ``ctx.event = [:]`` (namespace creation before member assignment)
  is a no-op here — flat columns need no parent map.
- reads observe earlier writes in the same script (store-forwarding
  through the symbolic state), including writes guarded by enclosing
  conditions.

Three module scripts use loops or helper functions and are compiled
by RECOGNIZED-SHAPE translations to higher-order Column functions
instead (still zero per-row Python):

- the param-driven field remap loop
  (``for (field in params.fields) { ... params.mapping.get(v) ... }``,
  mysql/slowlog) → unrolled per-field CASE chain;
- the first-public-IP scan (``boolean isPrivate(...)`` + for over
  ``remote_ip_list``, nginx/access) → ``F.filter`` + ``F.get``;
- the kv-map normalizer (iterator over ``ctx.auditd.log`` entries:
  drop ``?``/``(null)``/empty, hex→ASCII for exe/cmd, quote trim,
  arch remap; auditd/log) → ``map_filter`` + ``transform_values``.

Anything outside the subset raises :class:`PainlessError` — a script
must never silently mis-execute. Reference: script processor
``/root/reference/libbeat/processors/script/processor.go:34-52`` is
the JS cousin; the ingest-node scripts live only in the module JSONs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class PainlessError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RX = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?[Ll]?)
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\?\.|==|!=|<=|>=|&&|\|\||\+=|[-+*/!<>=.(){};,\[\]:])
    """,
    re.X,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if not m:
            raise PainlessError(f"painless: bad token at {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Path:
    parts: tuple[str, ...]  # ctx-relative, '?.'-normalized

    @property
    def name(self) -> str:
        return ".".join(self.parts)


@dataclass
class Param:
    name: str


@dataclass
class Lit:
    value: Any  # str | int | float | bool | None


@dataclass
class Bin:
    op: str
    left: Any
    right: Any


@dataclass
class Not:
    expr: Any


@dataclass
class Round:
    expr: Any


@dataclass
class ContainsKey:
    path: tuple[str, ...]  # full key path being tested


@dataclass
class EmptyMap:
    pass


@dataclass
class Assign:
    target: Path
    op: str  # '=' or '+='
    expr: Any


@dataclass
class If:
    cond: Any
    then: list
    orelse: list


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], params: Mapping[str, Any]):
        self.toks = tokens
        self.i = 0
        self.params = params

    # -- token helpers ----------------------------------------------------
    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, val: str) -> bool:
        if self.peek()[1] == val and self.peek()[0] in ("op", "id"):
            self.i += 1
            return True
        return False

    def expect(self, val: str) -> None:
        if not self.accept(val):
            raise PainlessError(
                f"painless: expected {val!r}, got {self.peek()[1]!r}"
            )

    # -- statements -------------------------------------------------------
    def parse_program(self) -> list:
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.parse_stmt())
        return stmts

    def parse_stmt(self):
        if self.accept("if"):
            return self.parse_if()
        # declarations / loops / functions are outside the subset
        kind, val = self.peek()
        if kind == "id" and val in ("for", "while", "def", "String",
                                    "boolean", "int", "long", "return"):
            raise PainlessError(f"painless: unsupported statement {val!r}")
        return self.parse_assign()

    def parse_if(self) -> If:
        self.expect("(")
        cond = self.parse_expr()
        self.expect(")")
        then = self.parse_block_or_stmt()
        orelse: list = []
        if self.accept("else"):
            if self.accept("if"):
                orelse = [self.parse_if()]
            else:
                orelse = self.parse_block_or_stmt()
        return If(cond, then, orelse)

    def parse_block_or_stmt(self) -> list:
        if self.accept("{"):
            stmts = []
            while not self.accept("}"):
                if self.peek()[0] == "eof":
                    raise PainlessError("painless: unterminated block")
                stmts.append(self.parse_stmt())
            return stmts
        return [self.parse_stmt()]

    def parse_assign(self) -> Assign:
        kind, val = self.peek()
        if kind != "id" or val != "ctx":
            raise PainlessError(
                f"painless: statement must assign a ctx field, got {val!r}"
            )
        target = self.parse_primary()
        if not isinstance(target, Path):
            raise PainlessError("painless: assignment target must be a path")
        op_kind, op = self.peek()
        if op not in ("=", "+="):
            raise PainlessError(f"painless: expected assignment, got {op!r}")
        self.next()
        expr = self.parse_expr()
        self.accept(";")
        return Assign(target, op, expr)

    # -- expressions (precedence climbing) ---------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        node = self.parse_and()
        while self.accept("||"):
            node = Bin("||", node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_eq()
        while self.accept("&&"):
            node = Bin("&&", node, self.parse_eq())
        return node

    def parse_eq(self):
        node = self.parse_rel()
        while self.peek()[1] in ("==", "!="):
            op = self.next()[1]
            node = Bin(op, node, self.parse_rel())
        return node

    def parse_rel(self):
        node = self.parse_add()
        while self.peek()[1] in ("<", "<=", ">", ">="):
            op = self.next()[1]
            node = Bin(op, node, self.parse_add())
        return node

    def parse_add(self):
        node = self.parse_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = Bin(op, node, self.parse_mul())
        return node

    def parse_mul(self):
        node = self.parse_unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = Bin(op, node, self.parse_unary())
        return node

    def parse_unary(self):
        if self.accept("!"):
            return Not(self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        kind, val = self.peek()
        if kind == "str":
            self.next()
            body = val[1:-1]
            return Lit(re.sub(r"\\(.)", r"\1", body))
        if kind == "num":
            self.next()
            raw = val.rstrip("Ll")
            return Lit(float(raw) if ("." in raw or "e" in raw.lower())
                       else int(raw))
        if self.accept("("):
            node = self.parse_expr()
            self.expect(")")
            return node
        if self.accept("["):
            self.expect(":")
            self.expect("]")
            return EmptyMap()
        if kind != "id":
            raise PainlessError(f"painless: unexpected token {val!r}")
        if val == "null":
            self.next()
            return Lit(None)
        if val in ("true", "false"):
            self.next()
            return Lit(val == "true")
        if val == "Math":
            self.next()
            self.expect(".")
            fn = self.next()[1]
            if fn != "round":
                raise PainlessError(f"painless: unsupported Math.{fn}")
            self.expect("(")
            node = self.parse_expr()
            self.expect(")")
            return Round(node)
        if val == "params":
            self.next()
            self.expect(".")
            name = self.next()[1]
            if name not in self.params:
                raise PainlessError(f"painless: missing param {name!r}")
            return Param(name)
        if val == "ctx":
            self.next()
            parts: list[str] = []
            while self.peek()[1] in (".", "?."):
                self.next()
                nkind, nval = self.next()
                if nkind != "id":
                    raise PainlessError(
                        f"painless: bad path element {nval!r}"
                    )
                if nval == "containsKey":
                    self.expect("(")
                    arg = self.parse_primary()
                    self.expect(")")
                    if not isinstance(arg, Lit) or not isinstance(
                        arg.value, str
                    ):
                        raise PainlessError(
                            "painless: containsKey needs a string literal"
                        )
                    return ContainsKey(tuple(parts) + (arg.value,))
                parts.append(nval)
            if not parts:
                raise PainlessError("painless: bare ctx is not a value")
            return Path(tuple(parts))
        raise PainlessError(f"painless: unexpected identifier {val!r}")


# ---------------------------------------------------------------------------
# compiler (symbolic execution → Columns)
# ---------------------------------------------------------------------------


def _fcol(name: str) -> Column:
    return F.col("`" + name + "`")


def _is_stringy(node: Any, params: Mapping[str, Any]) -> bool:
    """Painless overloads ``+`` as string concat; the corpus only
    mixes types through string literals / string params, so a ``+``
    whose either side is known-string compiles to concat."""
    if isinstance(node, Lit):
        return isinstance(node.value, str)
    if isinstance(node, Param):
        return isinstance(params[node.name], str)
    if isinstance(node, Bin) and node.op == "+":
        return _is_stringy(node.left, params) or _is_stringy(
            node.right, params
        )
    return False


class _Compiler:
    def __init__(
        self,
        columns: Sequence[str],
        params: Mapping[str, Any],
        resolver: Any = None,
        float_columns: Sequence[str] = (),
    ):
        self.columns = list(columns)
        self.params = params
        #: FloatType columns promoted to double on read (ES float
        #: storage, double painless arithmetic — see compile_statements)
        self.float_columns = set(float_columns)
        #: optional field→Column resolver (ingest passes _read_field so
        #: ctx paths reach INTO kv/json map columns — es/audit guards
        #: read `elasticsearch.audit.url.path` out of a json map)
        self.resolver = resolver
        # symbolic state: target name → Column expression reflecting
        # every (possibly guarded) assignment so far
        self.store: dict[str, Column] = {}

    # -- reads ------------------------------------------------------------
    def read(self, name: str) -> Column:
        if name in self.store:
            return self.store[name]
        # the resolver outranks a bare flat-column read: after a routed
        # `pipeline` union one ES field can have TWO homes — a flat
        # column (NULL on the other branch) and a kv/json map entry —
        # and ingest's _read_field coalesces both (es/slowlog's json
        # drop guard reads ...slowlog.type with a NULL flat column from
        # the plaintext branch shadowing the json map's value)
        if self.resolver is not None:
            c = self.resolver(name)
            if c is not None:
                return (
                    c.cast("double") if name in self.float_columns else c
                )
        if name in self.columns:
            c = _fcol(name)
            return c.cast("double") if name in self.float_columns else c
        return F.lit(None).cast("string")

    def _present(self, key: str) -> Column:
        """containsKey: the column itself (or any subfield column) is
        non-null. A key with no matching column is constant-absent."""
        exact = key in self.columns or key in self.store
        subs = [c for c in self.columns if c.startswith(key + ".")]
        out: Column | None = None
        if exact:
            out = self.read(key).isNotNull()
        for c in subs:
            n = _fcol(c).isNotNull()
            out = n if out is None else (out | n)
        if out is None and self.resolver is not None:
            c = self.resolver(key)
            if c is not None:
                out = c.isNotNull()
        return out if out is not None else F.lit(False)

    # -- expressions -------------------------------------------------------
    def expr(self, node: Any) -> Column:
        if isinstance(node, Lit):
            return F.lit(node.value)
        if isinstance(node, Param):
            v = self.params[node.name]
            if isinstance(v, (list, dict)):
                raise PainlessError(
                    f"painless: param {node.name!r} is a collection — only"
                    " the recognized loop shapes consume those"
                )
            return F.lit(v)
        if isinstance(node, Path):
            return self.read(node.name)
        if isinstance(node, ContainsKey):
            return self._present(".".join(node.path))
        if isinstance(node, Round):
            # painless Math.round → long, half-up on the positive
            # durations the modules scale; F.round matches
            return F.round(self.expr(node.expr), 0).cast("long")
        if isinstance(node, Not):
            return ~self.expr(node.expr)
        if isinstance(node, EmptyMap):
            raise PainlessError("painless: [:] only valid as assignment")
        if isinstance(node, Bin):
            return self._bin(node)
        raise PainlessError(f"painless: cannot compile {node!r}")

    def _bin(self, node: Bin) -> Column:
        op = node.op
        if op in ("==", "!="):
            # Objects.equals semantics (null-safe), see module docstring
            lnull = isinstance(node.left, Lit) and node.left.value is None
            rnull = isinstance(node.right, Lit) and node.right.value is None
            if lnull or rnull:
                side = node.right if lnull else node.left
                if isinstance(side, Path):
                    # `ctx.a.b != null` may name an OBJECT prefix: in
                    # our flat-column model the object "exists" iff any
                    # child column is non-null (es/server guards
                    # `ctx...gc.observation_duration != null` before
                    # scaling its .time leaf)
                    eq = ~self._present(side.name)
                else:
                    eq = self.expr(side).isNull()
            else:
                eq = self.expr(node.left).eqNullSafe(self.expr(node.right))
            return eq if op == "==" else ~eq
        l, r = self.expr(node.left), self.expr(node.right)
        if op == "&&":
            return l & r
        if op == "||":
            return l | r
        if op == "+":
            if _is_stringy(node.left, self.params) or _is_stringy(
                node.right, self.params
            ):
                return F.concat(l.cast("string"), r.cast("string"))
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        raise PainlessError(f"painless: unsupported operator {op!r}")

    # -- statements ---------------------------------------------------------
    def exec(self, stmts: list, cond: Column | None = None) -> None:
        for s in stmts:
            if isinstance(s, Assign):
                self._assign(s, cond)
            elif isinstance(s, If):
                c = self.expr(s.cond)
                under = c if cond is None else (cond & c)
                self.exec(s.then, under)
                if s.orelse:
                    neg = ~c
                    self.exec(
                        s.orelse, neg if cond is None else (cond & neg)
                    )
            else:
                raise PainlessError(f"painless: cannot execute {s!r}")

    def _assign(self, s: Assign, cond: Column | None) -> None:
        if isinstance(s.expr, EmptyMap):
            # namespace creation — flat columns need no parent map
            return
        name = s.target.name
        val = self.expr(s.expr)
        if s.op == "+=":
            cur = self.read(name)
            if _is_stringy(s.expr, self.params):
                val = F.concat(cur.cast("string"), val.cast("string"))
            else:
                val = cur + val
        if cond is not None:
            prev = self.store.get(name)
            if prev is None:
                prev = (
                    _fcol(name) if name in self.columns else F.lit(None)
                )
            val = F.when(cond, val).otherwise(prev)
        self.store[name] = val


def compile_expression(
    src: str,
    columns: Sequence[str],
    params: Mapping[str, Any] | None = None,
    resolver: Any = None,
) -> Column:
    """Compile a painless boolean expression (a step-level ``if``
    guard) to a Column. Null handling follows painless object
    equality; a ``ctx`` path with no matching column reads as NULL
    (the document lacks the field). ``resolver`` (field → Column or
    None) lets callers route reads through map columns."""
    p = _Parser(_tokenize(src), params or {})
    node = p.parse_expr()
    if p.peek()[0] != "eof":
        raise PainlessError(
            f"painless: trailing tokens after expression: {p.peek()[1]!r}"
        )
    return _Compiler(columns, params or {}, resolver).expr(node)


def compile_statements(
    src: str,
    columns: Sequence[str],
    params: Mapping[str, Any] | None = None,
    resolver: Any = None,
    float_columns: Sequence[str] = (),
) -> dict[str, Column]:
    """Compile a painless script body to its net effect: a mapping of
    assigned ctx-field → Column expression (reads of unassigned fields
    resolve to the input columns). Raises :class:`PainlessError` for
    anything outside the subset. ``float_columns`` are FloatType
    columns: painless stores ES ``:float`` fields as Java Float but
    promotes them to double for arithmetic — reads cast them to double
    so `Math.round(26.082f * 1e6)` reproduces ES's 26082001 (the
    float32 quantization happens at parse time, the math at 64-bit)."""
    params = params or {}
    stmts = _Parser(_tokenize(src), params).parse_program()
    c = _Compiler(columns, params, resolver, float_columns=float_columns)
    c.exec(stmts)
    return c.store


# ---------------------------------------------------------------------------
# recognized loop/function scripts (higher-order Column translations)
# ---------------------------------------------------------------------------

_FIELD_REMAP_LOOP = re.compile(
    r"^for \(field in params\.(\w+)\) \{ def v = ctx\.([\w.]+)\.get\(field\);"
    r" if \(v != null\) \{ ctx\.\2\.put\(field, params\.(\w+)\.get\(v\)\) \}"
    r" \}$"
)

_FIRST_PUBLIC_IP = re.compile(
    r"boolean isPrivate\(.*for \(def item : ctx\.([\w.]+)\)"
    r".*ctx\.([\w.]+) = item.*ctx\.\2 = ctx\.\1\[0\]",
    re.S,
)

_NAMESPACE_MOVE = re.compile(
    r"^def (\w+) = \['(\w+)': new HashMap\(\)\]; "
    r"for \(entry in ctx\['(\w+)'\]\.entrySet\(\)\) "
    r"\{ \1\['\2'\]\[entry\.getKey\(\)\] = entry\.getValue\(\); \} "
    r"ctx\['(\w+)'\] = \1; ctx\.remove\('\3'\);$"
)

_KV_NORMALIZE = re.compile(
    r"String trimQuotes\(.*def audit = ctx\.([\w.]+)\.get\(\"([\w.]+)\"\);"
    r".*entries\.remove\(\).*convertHexToString.*trimQuotes\("
    r"params\.(\w+), params\.(\w+), v\)",
    re.S,
)


def compile_recognized_script(
    source: str,
    params: Mapping[str, Any],
    columns: Sequence[str],
    string_columns: Sequence[str] | None = None,
) -> dict[str, Column] | None:
    """Structural translations for the three module scripts that use
    loops / helper functions (outside the statement subset). Returns
    the assignment mapping, or None when the source matches no shape.
    """
    src = " ".join(source.split())

    m = _FIELD_REMAP_LOOP.match(src)
    if m:
        # mysql/slowlog pipeline.json: remap listed subfields through
        # params.mapping; Map.get of an unmapped value is null
        fields_key, prefix, map_key = m.groups()
        fields = params.get(fields_key)
        mapping = params.get(map_key)
        if not isinstance(fields, list) or not isinstance(mapping, dict):
            raise PainlessError("painless: remap loop params malformed")
        out: dict[str, Column] = {}
        for f in fields:
            name = f"{prefix}.{f}"
            col = _fcol(name) if name in columns else F.lit(None).cast(
                "string"
            )
            remapped: Column | None = None
            for k, v in mapping.items():
                w = (col == F.lit(k), F.lit(v))
                remapped = (
                    F.when(*w) if remapped is None else remapped.when(*w)
                )
            # guarded by v != null: absent fields stay absent; present
            # values not in the mapping become null (Map.get contract)
            out[name] = F.when(col.isNotNull(), remapped).otherwise(col)
        return out

    m = _FIRST_PUBLIC_IP.search(src)
    if m:
        # nginx/access default.json: source.ip = first list entry that
        # is not RFC1918/loopback, else entry 0. The try/catch makes a
        # non-parseable entry NOT-private (selected), so the filter
        # keeps rows where the private test is false OR null.
        list_name, target = m.groups()
        lst = _fcol(list_name)

        def is_private(ip: Column) -> Column:
            # try_cast: an IPv6 entry must read as not-private (the
            # painless try/catch), not abort the job via ANSI cast
            # F.get: NULL (→ not-private) past the end, as for an
            # IPv6 entry with no dots — getItem would ANSI-error
            b1 = F.get(F.split(ip, r"\."), 0).try_cast("int")
            b2 = F.get(F.split(ip, r"\."), 1).try_cast("int")
            return (
                (b1 == 10)
                | ((b1 == 192) & (b2 == 168))
                | ((b1 == 172) & (b2 >= 16) & (b2 <= 31))
                | (b1 == 127)
            )

        public = F.filter(
            lst, lambda x: ~F.coalesce(is_private(x), F.lit(False))
        )
        return {target: F.coalesce(F.get(public, 0), F.get(lst, 0))}

    m = _NAMESPACE_MOVE.match(src)
    if m:
        # osquery/result pipeline.json (behind use_namespace): move the
        # whole json-decoded map under `<ns>.<sub>` and drop the source
        # column. A mapping value of None signals column DROP to the
        # script step.
        _var, sub, src_field, ns = m.groups()
        moved = (
            _fcol(src_field)
            if src_field in columns
            else F.lit(None).cast("map<string,string>")
        )
        return {f"{ns}.{sub}": moved, src_field: None}

    m = _KV_NORMALIZE.search(src)
    if m:
        # auditd/log pipeline.json: normalize the kv-parsed map —
        # drop ?/(null)/empty entries, hex→ASCII for exe/cmd, trim one
        # leading+trailing quote, arch c000003e → x86_64
        prefix, key, sq_key, dq_key = m.groups()
        name = f"{prefix}.{key}"
        if name not in columns:
            raise PainlessError(f"painless: kv map column missing: {name}")
        sq, dq = str(params[sq_key]), str(params[dq_key])
        hex_rx = "^(?:[0-9a-fA-F]{2})+$"
        quote_cls = "[" + re.escape(sq + dq) + "]"

        def norm(k: Column, v: Column) -> Column:
            unhexed = F.when(
                k.isin("exe", "cmd") & v.rlike(hex_rx),
                F.decode(F.unhex(v), "UTF-8"),
            ).otherwise(v)
            trimmed = F.regexp_replace(
                F.regexp_replace(unhexed, "^" + quote_cls, ""),
                quote_cls + "$",
                "",
            )
            return F.when(
                (k == "arch") & (trimmed == "c000003e"), F.lit("x86_64")
            ).otherwise(trimmed)

        cleaned = F.map_filter(
            _fcol(name), lambda k, v: ~v.isin("?", "(null)", "")
        )
        out = {name: F.transform_values(cleaned, norm)}
        # the ES script iterates the whole auditd.log OBJECT — which in
        # our model is the kv map PLUS the grok-extracted flat columns
        # under the same prefix (auditd.log.msg et al). Apply the same
        # normalization to each flat STRING column (`v instanceof
        # String` guards the trim in the script; sequence is an int by
        # now and must not be touched).
        for c in string_columns or ():
            if not c.startswith(name + ".") or c == name:
                continue
            k = c[len(name) + 1:]
            col = _fcol(c)
            kept = F.when(~col.isin("?", "(null)", ""), col)
            out[c] = F.when(kept.isNotNull(), norm(F.lit(k), kept))
        return out

    return None
