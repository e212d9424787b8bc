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
class ListLit:
    items: tuple


@dataclass
class Cast:
    type: str
    expr: Any


@dataclass
class Index:
    recv: Any
    idx: Any


@dataclass
class Method:
    recv: Any
    name: str
    args: tuple


@dataclass
class LocalRef:
    name: str


@dataclass
class Local:
    name: str
    expr: Any


@dataclass
class RemoveStmt:
    path: tuple


@dataclass
class AddStmt:
    path: tuple
    expr: Any


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
        kind, val = self.peek()
        # `def name = expr;` local declaration (coredns source split)
        if kind == "id" and val == "def":
            self.next()
            nkind, name = self.next()
            if nkind != "id":
                raise PainlessError("painless: bad local name")
            self.expect("=")
            expr = self.parse_expr()
            self.accept(";")
            return Local(name, expr)
        # loops / functions stay outside the subset (the recognized
        # shapes run before the generic parser)
        if kind == "id" and val in ("for", "while", "String",
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

    def parse_assign(self):
        kind, val = self.peek()
        if kind != "id" or val != "ctx":
            raise PainlessError(
                f"painless: statement must assign a ctx field, got {val!r}"
            )
        target = self.parse_primary()
        # expression-statements: ctx path method calls with effects
        # (`ctx.remove('k')`, `ctx.tags.add(x)` — zeek/coredns/
        # suricata)
        if isinstance(target, Method):
            if target.name == "remove":
                (arg,) = target.args
                if not isinstance(arg, Lit) or not isinstance(
                    arg.value, str
                ):
                    raise PainlessError(
                        "painless: remove needs a string literal"
                    )
                self.accept(";")
                return RemoveStmt(target.recv.parts + (arg.value,))
            if target.name == "add":
                (arg,) = target.args
                self.accept(";")
                return AddStmt(target.recv.parts, arg)
            raise PainlessError(
                f"painless: method {target.name!r} is not a statement"
            )
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

    _CAST_TYPES = ("long", "int", "short", "byte", "float", "double",
                   "char")

    def parse_unary(self):
        if self.accept("!"):
            return Not(self.parse_unary())
        # `(long)x` / `(char)("{")` C-style casts (zeek ts scale,
        # coredns charAt comparison)
        if (
            self.peek()[1] == "("
            and self.i + 2 < len(self.toks)
            and self.toks[self.i + 1][1] in self._CAST_TYPES
            and self.toks[self.i + 2][1] == ")"
        ):
            self.next()
            typ = self.next()[1]
            self.next()
            return Cast(typ, self.parse_unary())
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
            if self.accept(":"):
                self.expect("]")
                return EmptyMap()
            items = [self.parse_expr()]
            while self.accept(","):
                items.append(self.parse_expr())
            self.expect("]")
            return self._postfix(ListLit(tuple(items)))
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
        if val == "new":
            # `new HashMap()` — namespace creation, same no-op as [:]
            self.next()
            nkind, nval = self.next()
            if nval != "HashMap":
                raise PainlessError(
                    f"painless: unsupported constructor {nval!r}"
                )
            self.expect("(")
            self.expect(")")
            return EmptyMap()
        if val == "ctx":
            self.next()
            parts: list[str] = []
            while self.peek()[1] in (".", "?.", "["):
                sep = self.next()[1]
                if sep == "[":
                    # bracket segment: ctx['a']['@timestamp'] path
                    # element, or an integer element index
                    akind, aval = self.next()
                    if akind == "str":
                        parts.append(
                            re.sub(r"\\(.)", r"\1", aval[1:-1])
                        )
                        self.expect("]")
                        continue
                    if akind == "num":
                        self.expect("]")
                        return self._postfix(
                            Index(Path(tuple(parts)), int(aval))
                        )
                    raise PainlessError(
                        f"painless: bad subscript {aval!r}"
                    )
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
                if self.peek()[1] == "(":
                    # method call on the path so far
                    self.next()
                    args = []
                    if self.peek()[1] != ")":
                        args.append(self.parse_expr())
                        while self.accept(","):
                            args.append(self.parse_expr())
                    self.expect(")")
                    if not parts and nval not in ("remove",):
                        raise PainlessError(
                            f"painless: bare ctx method {nval!r}"
                        )
                    return self._postfix(
                        Method(Path(tuple(parts)), nval, tuple(args))
                    )
                parts.append(nval)
            if not parts:
                raise PainlessError("painless: bare ctx is not a value")
            return Path(tuple(parts))
        # bare identifier: a `def` local
        self.next()
        return self._postfix(LocalRef(val))

    def _postfix(self, node):
        """Chained method calls / indexes after a primary
        (``...substring(1, p)``, ``...session_ids[0]``)."""
        while True:
            if self.peek()[1] == ".":
                save = self.i
                self.next()
                nkind, nval = self.next()
                if nkind == "id" and self.peek()[1] == "(":
                    self.next()
                    args = []
                    if self.peek()[1] != ")":
                        args.append(self.parse_expr())
                        while self.accept(","):
                            args.append(self.parse_expr())
                    self.expect(")")
                    node = Method(node, nval, tuple(args))
                    continue
                self.i = save
                break
            if self.peek()[1] == "[":
                self.next()
                akind, aval = self.next()
                if akind != "num":
                    raise PainlessError(
                        f"painless: bad subscript {aval!r}"
                    )
                self.expect("]")
                node = Index(node, int(aval))
                continue
            break
        return node


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
        map_parent: Any = None,
        array_columns: Sequence[str] = (),
        string_columns: Sequence[str] = (),
    ):
        self.columns = list(columns)
        self.params = params
        #: flat ARRAY-typed columns: an [i] index reads them directly;
        #: any other indexed operand is a JSON-text array out of a
        #: map<string,string> home (zeek files rx_hosts) and parses
        #: through from_json first
        self.array_columns = set(array_columns)
        #: STRING-typed flat columns: arithmetic over them coerces
        #: through double (a numeric read out of a map<string,string>
        #: json home is TEXT here but a Double in ES — zeek's
        #: temp.duration * scale must not hit the string→bigint ANSI
        #: cast)
        self.string_columns = set(string_columns)
        #: optional field → (map_column, full_key) resolver so
        #: `.remove()` can clear a key out of its kv/json map home
        self.map_parent = map_parent
        #: `def` locals (assigned-once within their branch)
        self.locals: dict[str, Column] = {}
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
            v = self.store[name]
            # a removed field reads as absent
            return F.lit(None).cast("string") if v is None else v
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
        if isinstance(node, ListLit):
            raise PainlessError(
                "painless: list literal only valid with .contains"
            )
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
        if isinstance(node, LocalRef):
            if node.name not in self.locals:
                raise PainlessError(
                    f"painless: unknown identifier {node.name!r}"
                )
            return self.locals[node.name]
        if isinstance(node, Cast):
            return self._cast(node)
        if isinstance(node, Index):
            recv = self.expr(node.recv)
            if (
                isinstance(node.recv, Path)
                and node.recv.name in self.array_columns
            ):
                return F.get(recv, node.idx)
            return F.get(
                F.from_json(recv.cast("string"), "array<string>"),
                node.idx,
            )
        if isinstance(node, Method):
            return self._method(node)
        raise PainlessError(f"painless: cannot compile {node!r}")

    def _cast(self, node: Cast) -> Column:
        v = self.expr(node.expr)
        if node.type == "char":
            # chars are modeled as one-char strings (charAt output /
            # `(char)("{")` literals compare as strings)
            return v.cast("string")
        if node.type in ("long", "int", "short", "byte"):
            # painless numeric narrowing truncates toward zero; so
            # does Spark's double→integral cast. Dirty strings must
            # not abort the job under ANSI, and a DECIMAL-TEXT operand
            # (a float out of a map<string,string> json home, e.g.
            # zeek's epoch-seconds ts) only converts through double —
            # direct exact casts win so big longs keep precision.
            t = node.type if node.type != "byte" else "tinyint"
            return F.coalesce(
                v.try_cast(t), v.try_cast("double").try_cast(t)
            )
        return v.cast(node.type)

    def _method(self, node: Method) -> Column:
        name, args = node.name, node.args
        if isinstance(node.recv, ListLit):
            # `["a","b"].contains(ctx.x)` membership (cisco asa
            # message-id routing) → isin over the literal values
            if name != "contains" or len(args) != 1:
                raise PainlessError(
                    f"painless: unsupported list method {name!r}"
                )
            vals = []
            for it in node.recv.items:
                if not isinstance(it, Lit):
                    raise PainlessError(
                        "painless: list literals must be constant"
                    )
                vals.append(it.value)
            return self.expr(args[0]).isin(vals)
        recv = self.expr(node.recv)
        if name == "charAt":
            (i,) = args
            return recv.substr(self.expr(i) + 1, F.lit(1))
        if name == "indexOf":
            (sub,) = args
            if not isinstance(sub, Lit) or not isinstance(sub.value, str):
                raise PainlessError(
                    "painless: indexOf needs a string literal"
                )
            # painless returns -1 on absence; instr returns 0
            return F.instr(recv, sub.value) - 1
        if name == "length":
            if args:
                raise PainlessError("painless: length() takes no args")
            return F.length(recv)
        if name == "substring":
            if len(args) == 1:
                start = self.expr(args[0])
                return recv.substr(
                    start + 1, F.lit(1 << 30) - start
                )
            start, end = self.expr(args[0]), self.expr(args[1])
            return recv.substr(start + 1, end - start)
        if name == "toLowerCase":
            return F.lower(recv)
        if name == "toUpperCase":
            return F.upper(recv)
        if name == "startsWith":
            return recv.startswith(self.expr(args[0]))
        if name == "endsWith":
            return recv.endswith(self.expr(args[0]))
        if name == "contains":
            return recv.contains(self.expr(args[0]))
        if name == "trim":
            return F.trim(recv)
        raise PainlessError(f"painless: unsupported method {name!r}")

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
        if op in ("*", "/", "-"):
            l = self._as_num(node.left, l)
            r = self._as_num(node.right, r)
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

    def _as_num(self, node: Any, col: Column) -> Column:
        """Coerce a KNOWN-TEXT operand of numeric arithmetic through
        double (see ``string_columns``); typed operands pass
        untouched."""
        if isinstance(node, Path) and node.name not in self.store:
            name = node.name
            if name in self.string_columns or name not in self.columns:
                return col.try_cast("double")
        return col

    # -- statements ---------------------------------------------------------
    def exec(self, stmts: list, cond: Column | None = None) -> None:
        for s in stmts:
            if isinstance(s, Assign):
                self._assign(s, cond)
            elif isinstance(s, Local):
                self.locals[s.name] = self.expr(s.expr)
            elif isinstance(s, RemoveStmt):
                self._remove(s, cond)
            elif isinstance(s, AddStmt):
                self._add(s, cond)
            elif isinstance(s, If):
                # a json-map read used as a bare condition is a
                # STRING "true"/"false" in our map<string,string>
                # model (zeek `if (ctx...local_orig) tags.add`);
                # try_cast keeps boolean conditions untouched and
                # NULL-for-garbage (painless would NPE — neither
                # branch runs, which matches when(null) semantics)
                c = self.expr(s.cond).try_cast("boolean")
                under = c if cond is None else (cond & c)
                self.exec(s.then, under)
                if s.orelse:
                    neg = ~c
                    self.exec(
                        s.orelse, neg if cond is None else (cond & neg)
                    )
            else:
                raise PainlessError(f"painless: cannot execute {s!r}")

    def _remove(self, s: RemoveStmt, cond: Column | None) -> None:
        """``ctx.remove('k')`` / ``ctx.a.b.remove('k')``: drop the
        flat column (and every ``k.``-child column — 'k' may name an
        object prefix, like coredns's remove('temp')), and filter the
        key out of a kv/json map home when one exists (the two-homes
        rule)."""
        if cond is not None:
            raise PainlessError(
                "painless: conditional remove is not supported"
            )
        name = ".".join(s.path)
        mp = self.map_parent(name) if self.map_parent else None
        if mp is not None:
            parent, full_key = mp
            cur = self.read(parent)
            # the removed name may be an OBJECT prefix inside the map
            # (dotted child keys) — drop those too, like ES dropping
            # the whole subtree
            self.store[parent] = F.map_filter(
                cur,
                lambda k, _: (k != full_key)
                & ~k.startswith(full_key + "."),
            )
        for c in list(self.store) + self.columns:
            if c == name or c.startswith(name + "."):
                self.store[c] = None

    def _add(self, s: AddStmt, cond: Column | None) -> None:
        """``ctx.tags.add(x)``: append to an array field (painless
        List.add — duplicates allowed, unlike the add_tags dedup)."""
        name = ".".join(s.path)
        removed = name in self.store and self.store[name] is None
        absent = removed or (
            name not in self.store
            and name not in self.columns
            and (self.resolver is None or self.resolver(name) is None)
        )
        cur = (
            F.lit(None).cast("array<string>")
            if absent
            else self.read(name)
        )
        val = F.concat(
            F.coalesce(cur, F.array().cast("array<string>")),
            F.array(self.expr(s.expr).cast("string")),
        )
        if cond is not None:
            val = F.when(cond, val).otherwise(cur)
        self.store[name] = val

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
    map_parent: Any = None,
    array_columns: Sequence[str] = (),
    string_columns: Sequence[str] = (),
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
    c = _Compiler(
        columns, params, resolver,
        float_columns=float_columns, map_parent=map_parent,
        array_columns=array_columns, string_columns=string_columns,
    )
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


_IPT_MAPPINGS_LOOP = re.compile(
    r"^for \(action in params\.mappings\) \{ def src = "
    r"ctx\[action\.source\.object\];"
)

_IPT_HEX_LOOP = re.compile(
    r"^def (\w+) = ctx\['(\w+)'\]; if \1 != null\b"
    r"|^def (\w+) = ctx\['(\w+)'\]; if \(\3 != null\)"
)

_DOMAIN_DISTINCT = re.compile(
    r"^def domain = ctx\.([\w.]+)\?\.domain; "
    r"if \(domain instanceof Collection\)"
)

_NETSUM = re.compile(
    r"^long getOrZero\(def map, def key\).*"
    r"def network=ctx\['network'\], source=ctx\['source'\], "
    r"dest=ctx\['destination'\];",
    re.S,
)

_HMS_DURATION = re.compile(
    r"long parse_hms\(String s\).*"
    r"parse_hms\(ctx\.([\w.]+?)\) \* 1000000000L",
    re.S,
)

_INSTANT_DURATION = re.compile(
    r"^Instant ins\(def d\)\{try\{return Instant\.parse\(d\);\}"
    r".*ev\['duration'\] = Duration\.between\(start,end\)\.toNanos\(\)",
    re.S,
)


def compile_recognized_script(
    source: str,
    params: Mapping[str, Any],
    columns: Sequence[str],
    string_columns: Sequence[str] | None = None,
    resolver: Any = None,
) -> dict[str, Column] | None:
    """Structural translations for the module scripts that use
    loops / helper functions (outside the statement subset). Returns
    the assignment mapping, or None when the source matches no shape.
    """
    src = " ".join(source.split())

    def _read(name: str) -> Column:
        if name in columns:
            return _fcol(name)
        if resolver is not None:
            c = resolver(name)
            if c is not None:
                return c
        return F.lit(None).cast("string")

    m = _IPT_MAPPINGS_LOOP.match(src)
    if m:
        # x-pack iptables: per-action value translation through
        # params.mappings — dst[key] assigned ONLY when map[src] hits
        # (unmapped values leave the destination untouched, unlike
        # the mysql remap loop which nulls them)
        actions = params.get("mappings")
        if not isinstance(actions, list):
            raise PainlessError("painless: mappings param malformed")
        out: dict[str, Column] = {}
        for action in actions:
            sname = f"{action['source']['object']}.{action['source']['key']}"
            dname = (
                f"{action['destination']['object']}"
                f".{action['destination']['key']}"
            )
            sval = out.get(sname, _read(sname))
            mapped: Column | None = None
            for k, v in action["map"].items():
                w = (sval == F.lit(k), F.lit(v))
                mapped = F.when(*w) if mapped is None else mapped.when(*w)
            prev = out.get(dname, _read(dname))
            out[dname] = F.coalesce(mapped, prev)
        return out

    m = _IPT_HEX_LOOP.match(src)
    if m:
        # x-pack iptables: listed <prefix>.<key> hex strings → long.
        # The script walks chars skipping non-hex (so "0x08" and
        # "08:00" both read as plain hex digits) and yields 0 when no
        # hex digit appears; null fields stay null.
        prefix = m.group(2) or m.group(4)
        keys = params.get("hex_fields_to_convert")
        if not isinstance(keys, list):
            raise PainlessError(
                "painless: hex_fields_to_convert param malformed"
            )
        out = {}
        for k in keys:
            name = f"{prefix}.{k}"
            col = _read(name)
            cleaned = F.regexp_replace(
                F.lower(col.cast("string")), "[^0-9a-f]", ""
            )
            out[name] = F.when(
                col.isNotNull(),
                F.coalesce(
                    F.conv(cleaned, 16, 10).try_cast("long"), F.lit(0)
                ),
            )
        return out

    m = _DOMAIN_DISTINCT.match(src)
    if m:
        # suricata eve: dedup a multi-valued destination.domain and
        # unwrap single-element lists to a scalar. In the
        # map<string,string> document model a json LIST value is its
        # JSON text — parse it, distinct, unwrap; a plain scalar (the
        # `instanceof Collection` false branch) passes through.
        name = f"{m.group(1)}.domain"
        col = _read(name).cast("string")
        # a LIST value inside the map<string,string> json home is the
        # Spark cast rendering "[a, b]" (from_json coerces nested
        # arrays via CAST, not JSON text)
        inner = F.regexp_extract(col, r"^\[(.*)\]$", 1)
        parsed = F.when(
            col.rlike(r"^\[.*\]$"), F.split(inner, ", ")
        )
        distinct = F.array_distinct(parsed)
        return {
            name: F.when(parsed.isNull(), col)
            .when(F.size(distinct) == 1, F.get(distinct, 0))
            .otherwise(F.to_json(distinct))
        }

    if _NETSUM.search(src):
        # suricata eve: network.bytes/packets = source+destination
        # sums, assigned only when positive
        def oz(name: str) -> Column:
            return F.coalesce(_read(name).try_cast("long"), F.lit(0))

        sb, db = oz("source.bytes"), oz("destination.bytes")
        sp, dp = oz("source.packets"), oz("destination.packets")
        return {
            "network.bytes": F.when(sb + db > 0, sb + db).otherwise(
                _read("network.bytes").try_cast("long")
            ),
            "network.packets": F.when(sp + dp > 0, sp + dp).otherwise(
                _read("network.packets").try_cast("long")
            ),
        }

    m = _HMS_DURATION.search(src)
    if m:
        # cisco asa: parse "h:mm:ss" elapsed time → event.duration
        # nanos, event.end = @timestamp, event.start = end - duration.
        # parse_hms returns 0 the moment any non-digit/colon appears.
        hms_field = m.group(1)
        sv = _read(hms_field).cast("string")
        secs = F.when(
            sv.rlike("^[0-9]+(:[0-9]+)*$"),
            F.aggregate(
                F.split(sv, ":"),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 60 + x.cast("long"),
            ),
        ).otherwise(F.when(sv.isNotNull(), F.lit(0).cast("long")))
        nanos = secs * F.lit(1_000_000_000).cast("long")
        raw = _read("@timestamp").cast("string")
        ts = F.try_to_timestamp(raw)
        # String-valued copy of the Instant: ES renders ISO millis-Z
        # ("2013-04-29T12:59:50.000Z"); a raw TimestampType cast would
        # read "2013-04-29 12:59:50"
        iso = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        end = F.coalesce(F.date_format(ts, iso), raw)
        start = F.date_format(
            ts - F.make_interval(secs=secs.cast("double")), iso
        )
        return {
            "event.end": end,
            "event.duration": nanos,
            "event.start": start,
        }

    if _INSTANT_DURATION.search(src):
        # suricata eve: event.duration = nanos between event.start and
        # event.end (both written by earlier date processors as
        # millisecond-precision ISO 'Z' strings — Instant.parse
        # accepts exactly that form). Parse failure or start>end
        # leaves the field alone.
        st = F.try_to_timestamp(_read("event.start").cast("string"))
        en = F.try_to_timestamp(_read("event.end").cast("string"))
        # ES's date processors emit MILLIS-truncated ISO strings, so
        # Instant.parse sees ms precision — truncate before diffing
        stms = F.floor(F.unix_micros(st) / 1000)
        enms = F.floor(F.unix_micros(en) / 1000)
        nanos = ((enms - stms) * 1_000_000).cast("long")
        return {
            "event.duration": F.when(
                st.isNotNull() & en.isNotNull() & (st <= en), nanos
            ).otherwise(_read("event.duration").try_cast("long"))
        }

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
