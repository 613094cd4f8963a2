"""Rego-subset loader (C1 migration path): parse swarm rule files.

The reference's entire rule surface is ``.rego`` policies compiled and
evaluated by OPA (/root/reference/pkg/infra/policy/client.go:35-120):
``package event`` rules map object metadata → sources, and
``package schema.<name>`` rules map parsed records → routed Log rows
(shipped rules: pkg/usecase/testdata/policy/{event,schema}.rego,
examples/readme/policy/). So an existing swarm deployment can port its
rules unchanged, this module parses the subset those shipped rules
actually use and translates it onto the declarative config layer
(:func:`swarm_spark.rules.config.load_rules`) — which compiles to
Catalyst expressions, keeping rule evaluation JVM-side instead of
re-implementing an OPA interpreter per record.

Supported subset (everything observed in the shipped policies):

- ``package event`` / ``package schema.<name>`` / ``package auth``
  headers (auth compiles to :class:`RegoAuthPolicy` for the HTTP
  middleware — default-deny, valued/bare boolean rules, ``[_]``
  membership over header/query lists; see the class docstring)
- set-rule heads ``src[{...}]`` / ``src[s] { ... s := {...} }`` and
  ``log[{...}]`` / ``log[d] { ... d := {...} }``
- body statements: ``path == literal`` equality,
  ``startswith(path, lit)`` / ``endswith`` / ``contains``,
  assignments ``v := <object>``, fan-out ``r := input.Records[_]``
- head values: string/number literals, record field paths
  (``r.eventID`` / ``input.log_id``), the whole record (``data: r``),
  ``time.parse_rfc3339_ns(path)`` under arithmetic scaling chains, and
  ``json.patch(r, [{"op": "remove", "path": "/a/b"}, ...])``

Timestamp normalization: the reference consumes ``log.timestamp`` as
float SECONDS (pkg/usecase/load.go:233-236). Its shipped fixture wraps
``time.parse_rfc3339_ns`` in ``((x/1000)*1000)*1000`` — a µs-truncation
in intent (ns out). We normalize any ``parse_rfc3339_ns`` scaling chain
to RFC3339 → seconds, which is what the pipeline contract expects; the
reference's own tests assert ids, not timestamps
(pkg/usecase/load_test.go:113-126).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from dataclasses import dataclass
from typing import Any

from ..model import ModelError
from .config import load_rules
from .event import EventRuleSet
from .schema_rule import SchemaRuleRegistry


class RegoError(ModelError):
    """Rego source outside the supported subset."""


# ------------------------------------------------------------ tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<ident>[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)
  | (?P<op>:=|==|!=|<=|>=|<|>|=|\[|\]|\{|\}|\(|\)|,|:|\*|/|\+|-|\.)
""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise RegoError(f"unexpected character at offset {i}: {text[i:i + 20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


# ----------------------------------------------------------------- AST
@dataclass(frozen=True)
class Lit:
    value: Any


@dataclass(frozen=True)
class Path:
    parts: tuple[str, ...]
    fanout: bool = False  # trailing [_]


@dataclass(frozen=True)
class Call:
    fn: str
    args: tuple


@dataclass(frozen=True)
class Bin:
    op: str
    left: Any
    right: Any


@dataclass(frozen=True)
class Eq:
    left: Any
    right: Any


@dataclass(frozen=True)
class Cmp:
    """Ordering / inequality comparison (`!=` `<` `>` `<=` `>=`)."""

    op: str
    left: Any
    right: Any


@dataclass(frozen=True)
class Index:
    """Postfix access that is not a plain input-path extension:
    integer indexing (``authHdr[0]``), key/attr access on a call
    result (``http.send(...).raw_body``, ``claims[1]["iss"]``)."""

    obj: Any
    key: Any  # int or str


@dataclass(frozen=True)
class Assign:
    var: str
    value: Any


@dataclass(frozen=True)
class Rule:
    head_name: str
    head: Any  # dict literal or Path (a variable); None for complete rules
    body: tuple
    value: Any = None  # complete-rule value (`deny = false { ... }`)
    is_default: bool = False  # `default deny = true`
    params: tuple | None = None  # function rule `f(x) := ... { ... }`


@dataclass(frozen=True)
class Module:
    package: tuple[str, ...]
    rules: tuple[Rule, ...]


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text: str):
        kind, val = self.next()
        if val != text:
            raise RegoError(f"expected {text!r}, got {val!r}")
        return val

    # ---------------- module
    def module(self) -> Module:
        kind, val = self.next()
        if val != "package":
            raise RegoError("rego module must start with 'package'")
        kind, pkg = self.next()
        if kind != "ident":
            raise RegoError("bad package name")
        rules = []
        while self.peek()[0] != "eof":
            kind, val = self.peek()
            if val == "import":  # ignore imports (e.g. future.keywords)
                self.next()
                self.next()
                continue
            rules.append(self.rule())
        return Module(tuple(pkg.split(".")), tuple(rules))

    def rule(self) -> Rule:
        kind, name = self.next()
        if kind != "ident":
            raise RegoError(f"expected rule name, got {name!r}")
        if name == "default":
            # `default deny = true` — complete rule default value
            kind, name = self.next()
            if kind != "ident":
                raise RegoError(f"expected rule name after default, got {name!r}")
            if self.next()[1] not in ("=", ":="):
                raise RegoError("default rule must assign a value")
            return Rule(name, None, (), value=self.expr(), is_default=True)
        nxt = self.peek()[1]
        if nxt == "[":
            # set rule: `src[{...}] { body }`
            self.next()
            head = self.expr()
            self.expect("]")
            return Rule(name, head, self._body())
        if nxt == "(":
            # function rule: `f(x) := <expr>` with optional body
            self.next()
            params = []
            while self.peek()[1] != ")":
                kind, p = self.next()
                if kind != "ident":
                    raise RegoError(f"bad function parameter {p!r}")
                params.append(p)
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            if self.next()[1] not in ("=", ":="):
                raise RegoError(f"function rule {name!r} must assign a value")
            value = self.expr()
            body = self._body() if self.peek()[1] == "{" else ()
            return Rule(name, None, body, value=value, params=tuple(params))
        if nxt in ("=", ":="):
            # complete rule with value: `deny = false { allow }`
            self.next()
            value = self.expr()
            return Rule(name, None, self._body(), value=value)
        if nxt == "{":
            # bare boolean rule: `allow { body }` (value true)
            return Rule(name, None, self._body(), value=Lit(True))
        raise RegoError(f"unsupported rule shape for {name!r} near {nxt!r}")

    def _body(self) -> tuple:
        self.expect("{")
        body = []
        while self.peek()[1] != "}":
            body.append(self.statement())
        self.expect("}")
        return tuple(body)

    # ---------------- statements
    def statement(self):
        if self.peek()[0] == "ident" and self.peek(1)[1] == ":=":
            kind, var = self.next()
            self.next()  # :=
            return Assign(var, self.expr())
        left = self.expr()
        if self.peek()[1] == "==":
            self.next()
            return Eq(left, self.expr())
        if self.peek()[1] in ("!=", "<", ">", "<=", ">="):
            op = self.next()[1]
            return Cmp(op, left, self.expr())
        if isinstance(left, Call):
            return left  # builtin predicate call (startswith/…)
        if isinstance(left, Path) and len(left.parts) == 1 and not left.fanout:
            return left  # bare rule reference (`allow`)
        raise RegoError(f"unsupported statement near {self.peek()[1]!r}")

    # ---------------- expressions (with * / + - arithmetic)
    def expr(self):
        left = self.term()
        while self.peek()[1] in ("*", "/", "+", "-"):
            op = self.next()[1]
            left = Bin(op, left, self.term())
        return left

    def term(self):
        kind, val = self.peek()
        if val == "(":
            self.next()
            e = self.expr()
            self.expect(")")
            return self._postfix(e)
        if val == "{":
            return self.object()
        if val == "[":
            return self.array()
        if kind == "str":
            self.next()
            return Lit(_unquote(val))
        if kind == "num":
            self.next()
            return Lit(float(val) if "." in val else int(val))
        if kind == "ident":
            self.next()
            if val in ("true", "false", "null"):
                return Lit({"true": True, "false": False, "null": None}[val])
            if self.peek()[1] == "(":  # call
                self.next()
                args = []
                while self.peek()[1] != ")":
                    args.append(self.expr())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                return self._postfix(Call(val, tuple(args)))
            return self._postfix(Path(tuple(val.split("."))))
        raise RegoError(f"unexpected token {val!r}")

    def _postfix(self, base):
        """``[...]`` / ``.attr`` chains on any base expression. String
        keys on a plain (non-fanned) Path extend its parts (the
        ``input.header["X"]`` shape the input resolver consumes);
        integer keys, post-fanout keys, and access on call results
        become :class:`Index` nodes."""
        while True:
            nxt = self.peek()[1]
            if nxt == "[":
                self.next()
                kind2, v2 = self.next()
                if v2 == "_":
                    if not isinstance(base, Path):
                        raise RegoError("[_] fan-out only applies to a path")
                    base = Path(base.parts, fanout=True)
                elif kind2 == "str":
                    key = _unquote(v2)
                    if isinstance(base, Path) and not base.fanout:
                        base = Path(base.parts + (key,))
                    else:
                        base = Index(base, key)
                elif kind2 == "num" and "." not in v2:
                    base = Index(base, int(v2))
                else:
                    raise RegoError(
                        f"only [_], [\"key\"] or [int] indexing supported, got {v2!r}"
                    )
                self.expect("]")
            elif nxt == ".":
                # standalone `.` only lexes after `)` / `]` (dotted
                # idents are single tokens), i.e. `http.send(...).raw_body`
                self.next()
                kind2, v2 = self.next()
                if kind2 != "ident":
                    raise RegoError(f"expected attribute name after '.', got {v2!r}")
                base = Index(base, v2)
            else:
                return base

    def object(self):
        self.expect("{")
        out = {}
        while self.peek()[1] != "}":
            kind, key = self.next()
            if kind != "str":
                raise RegoError(f"object keys must be strings, got {key!r}")
            self.expect(":")
            out[_unquote(key)] = self.expr()
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return out

    def array(self):
        self.expect("[")
        out = []
        while self.peek()[1] != "]":
            out.append(self.expr())
            if self.peek()[1] == ",":
                self.next()
        self.expect("]")
        return out


def _unquote(s: str) -> str:
    return s[1:-1].encode().decode("unicode_escape")


def parse_rego(text: str) -> Module:
    return _Parser(_tokenize(text)).module()


# ------------------------------------------------------ translation
def _resolve_head(rule: Rule) -> dict:
    """The head object literal, or the body assignment it names."""
    if isinstance(rule.head, dict):
        return rule.head
    if isinstance(rule.head, Path) and len(rule.head.parts) == 1:
        var = rule.head.parts[0]
        for stmt in rule.body:
            if isinstance(stmt, Assign) and stmt.var == var and isinstance(stmt.value, dict):
                return stmt.value
        raise RegoError(f"head variable {var!r} not assigned an object in body")
    raise RegoError(f"unsupported rule head: {rule.head!r}")


_NAME_FIELDS = {"name"}
_BUCKET_FIELDS = {"bucket"}


def _event_when(rule: Rule) -> dict:
    """Body conditions → config `when` spec."""
    when: dict[str, Any] = {}

    def meta_field(p: Path) -> str:
        # input.cs.name / input.data.bucket / input.data.kind → last part
        if p.parts[0] != "input" or len(p.parts) < 2:
            raise RegoError(f"unsupported event path {'.'.join(p.parts)}")
        return p.parts[-1]

    for stmt in rule.body:
        if isinstance(stmt, Assign):
            continue  # head assignment
        if isinstance(stmt, Eq):
            p, lit = (stmt.left, stmt.right)
            if isinstance(p, Lit) and isinstance(lit, Path):
                p, lit = lit, p
            if not (isinstance(p, Path) and isinstance(lit, Lit)):
                raise RegoError(f"unsupported equality {stmt!r}")
            field = meta_field(p)
            if field in _BUCKET_FIELDS:
                when["bucket"] = lit.value
            elif field in _NAME_FIELDS:
                when["name_glob"] = lit.value
            elif field == "kind":
                if lit.value != "storage#object":
                    raise RegoError(f"unsupported kind {lit.value!r}")
                # GCS notification payload kind — always true for object
                # metadata; no predicate needed
            elif field == "size":
                when["min_size"] = lit.value
            else:
                raise RegoError(f"unsupported metadata field {field!r}")
        elif isinstance(stmt, Call):
            if len(stmt.args) != 2 or not isinstance(stmt.args[0], Path) or not isinstance(
                stmt.args[1], Lit
            ):
                raise RegoError(f"unsupported builtin call {stmt!r}")
            field = meta_field(stmt.args[0])
            if field not in _NAME_FIELDS:
                raise RegoError(f"{stmt.fn} only supported on object name")
            key = {
                "startswith": "name_prefix",
                "endswith": "name_suffix",
                "contains": "name_contains",
            }.get(stmt.fn)
            if key is None:
                raise RegoError(f"unsupported builtin {stmt.fn!r}")
            when[key] = stmt.args[1].value
        else:
            raise RegoError(f"unsupported statement {stmt!r}")
    return when


def _rel_path(p: Path, record_var: str) -> str:
    if p.parts[0] in (record_var, "input"):
        if len(p.parts) == 1:
            raise RegoError("expected a field path, got the record itself")
        return ".".join(p.parts[1:])
    raise RegoError(f"path {'.'.join(p.parts)} not rooted at record")


def _find_call(expr, fn: str):
    if isinstance(expr, Call) and expr.fn == fn:
        return expr
    if isinstance(expr, Bin):
        return _find_call(expr.left, fn) or _find_call(expr.right, fn)
    return None


def _timestamp_spec(expr, record_var: str) -> dict:
    call = _find_call(expr, "time.parse_rfc3339_ns")
    if call is not None:
        if len(call.args) != 1 or not isinstance(call.args[0], Path):
            raise RegoError("parse_rfc3339_ns takes one field path")
        # normalize the whole scaling chain to seconds (module docstring)
        return {"field": _rel_path(call.args[0], record_var)}
    # numeric field with optional scaling arithmetic
    scale = 1.0
    node = expr
    while isinstance(node, Bin):
        if isinstance(node.right, Lit):
            num = float(node.right.value)
            if node.op == "*":
                scale *= num
            elif node.op == "/":
                scale /= num
            else:
                raise RegoError(f"unsupported timestamp arithmetic {node.op!r}")
            node = node.left
        elif isinstance(node.left, Lit) and node.op == "*":
            scale *= float(node.left.value)
            node = node.right
        else:
            raise RegoError("unsupported timestamp expression")
    if not isinstance(node, Path):
        raise RegoError("timestamp must derive from a record field")
    spec: dict[str, Any] = {"unix_field": _rel_path(node, record_var)}
    if scale != 1.0:
        spec["scale"] = scale
    return spec


def _schema_spec(name: str, rule: Rule) -> dict:
    head = _resolve_head(rule)
    record_var, fanout = "input", ""
    for stmt in rule.body:
        if isinstance(stmt, Assign) and isinstance(stmt.value, Path) and stmt.value.fanout:
            record_var = stmt.var
            fanout = ".".join(stmt.value.parts[1:])  # strip leading input
    spec: dict[str, Any] = {"name": name, "fanout": fanout}

    for key in ("dataset", "table"):
        v = head.get(key)
        if isinstance(v, Lit) and isinstance(v.value, str):
            spec[key] = v.value
        elif isinstance(v, Path):
            spec[key] = {"from_field": _rel_path(v, record_var)}
        else:
            raise RegoError(f"schema rule {name!r}: bad {key} {v!r}")
    if "timeunit" in head:
        tu = head["timeunit"]
        if not isinstance(tu, Lit):
            raise RegoError(f"schema rule {name!r}: timeunit must be literal")
        spec["partition"] = tu.value
    if "id" in head:
        idv = head["id"]
        if not isinstance(idv, Path):
            raise RegoError(f"schema rule {name!r}: id must be a field path")
        spec["id"] = _rel_path(idv, record_var)
    if "timestamp" not in head:
        raise RegoError(f"schema rule {name!r}: timestamp is required")
    spec["timestamp"] = _timestamp_spec(head["timestamp"], record_var)

    data = head.get("data")
    if isinstance(data, Path) and data.parts == (record_var,):
        spec["data"] = "record"
    elif isinstance(data, Call) and data.fn == "json.patch":
        if len(data.args) != 2 or not isinstance(data.args[0], Path) or not isinstance(
            data.args[1], list
        ):
            raise RegoError(f"schema rule {name!r}: unsupported json.patch shape")
        if data.args[0].parts != (record_var,):
            raise RegoError(f"schema rule {name!r}: json.patch must apply to the record")
        drops = []
        for op in data.args[1]:
            if not isinstance(op, dict):
                raise RegoError("json.patch ops must be object literals")
            o = {k: v.value if isinstance(v, Lit) else v for k, v in op.items()}
            if o.get("op") != "remove":
                raise RegoError(f"json.patch: only 'remove' supported, got {o.get('op')!r}")
            drops.append(str(o["path"]).strip("/").replace("/", "."))
        spec["data"] = "record"
        spec["drop"] = drops
    else:
        raise RegoError(f"schema rule {name!r}: unsupported data value {data!r}")
    return spec


def rego_to_config(texts: list[str]) -> dict:
    """Translate rego module sources into the declarative rule config."""
    config: dict[str, list] = {"event_rules": [], "schema_rules": []}
    for text in texts:
        mod = parse_rego(text)
        if mod.package == ("event",):
            for i, rule in enumerate(mod.rules):
                if rule.head_name != "src":
                    raise RegoError(f"event rules must be src[...], got {rule.head_name}")
                head = _resolve_head(rule)
                src = {
                    k: (v.value if isinstance(v, Lit) else v)
                    for k, v in head.items()
                }
                for k, v in src.items():
                    if not isinstance(v, str):
                        raise RegoError(f"source field {k!r} must be a string literal")
                config["event_rules"].append(
                    {
                        "name": f"event:{i}",
                        "when": _event_when(rule),
                        "sources": [src],
                    }
                )
        elif len(mod.package) == 2 and mod.package[0] == "schema":
            name = mod.package[1]
            for rule in mod.rules:
                if rule.head_name != "log":
                    raise RegoError(f"schema rules must be log[...], got {rule.head_name}")
                config["schema_rules"].append(_schema_spec(name, rule))
        elif mod.package == ("auth",):
            continue  # auth policies compile separately (rego_to_auth)
        else:
            raise RegoError(f"unsupported package {'.'.join(mod.package)!r}")
    return config


# ------------------------------------------------------ auth package (A1)
class _Undefined(Exception):
    """Rego 'undefined' — a data-dependent miss (absent key, index out
    of range, malformed token). Fails the enclosing rule body instead
    of erroring, matching OPA semantics."""


def _rego_typed_key(v):
    """Canonical comparison key under OPA's typed equality.

    Python's ``==`` treats ``True == 1`` — OPA does not (booleans and
    numbers are different types), while OPA's single number type makes
    ``1 == 1.0`` true. Recursive so conflict detection sees
    ``{"a": true}`` vs ``{"a": 1}`` as distinct too."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int, float)):
        return ("number", float(v))
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_rego_typed_key(x) for x in v))
    if isinstance(v, dict):
        return (
            "object",
            tuple(sorted((str(k), _rego_typed_key(x)) for k, x in v.items())),
        )
    return (type(v).__name__, v)


try:  # optional: only io.jwt.*verify* builtins need it (docs/rule.md:252-283)
    import jwt as _pyjwt
    from jwt import algorithms as _pyjwt_algorithms

    _HAS_JWT_CRYPTO = bool(getattr(_pyjwt_algorithms, "has_crypto", False))
except ImportError:  # pragma: no cover - exercised in bare containers
    _pyjwt = None
    _HAS_JWT_CRYPTO = False


def _jwt_unverified_decode(token: str) -> list:
    """``io.jwt.decode``: [header, payload, signature-hex] — pure
    base64url/JSON, no crypto dependency (OPA returns the same triple
    without verifying)."""
    import base64
    import json as _json

    try:
        h, p, s = token.split(".")

        def b64(seg: str) -> bytes:
            return base64.urlsafe_b64decode(seg + "=" * (-len(seg) % 4))

        return [_json.loads(b64(h)), _json.loads(b64(p)), b64(s).hex()]
    except Exception as exc:  # malformed token → undefined, not error
        raise _Undefined(f"io.jwt.decode: {exc}") from exc


_PURE_AUTH_BUILTINS = frozenset(
    {
        "count",
        "split",
        "lower",
        "upper",
        "startswith",
        "endswith",
        "contains",
        "trim_space",
        "time.now_ns",
        "io.jwt.decode",
    }
)
_JWT_VERIFY_BUILTINS = frozenset({"io.jwt.verify_rs256", "io.jwt.decode_verify"})


class RegoAuthPolicy:
    """Compiled ``package auth`` policy — the reference's HTTP
    authorization surface (pkg/usecase/auth.go:16-43, docs/rule.md
    §Authorization Rule): ``data.auth.deny`` evaluated over
    ``{method, path, remote, query, header, body}``; undefined deny is
    treated as false (allow).

    The evaluator is a small environment-based interpreter covering
    the doc's full JWT example (docs/rule.md:252-283) verbatim:
    ``default deny`` / valued / bare boolean rules, local ``:=``
    bindings, function rules (``jwks_request(url) := http.send(...)``),
    ``[_]`` membership, integer/key indexing, arithmetic, ordering
    comparisons, and the builtins count/split/lower/upper/startswith/
    endswith/contains/trim_space/time.now_ns/io.jwt.decode.

    Environment-gated builtins (validated at LOAD, so unusable
    policies still fail loudly):

    - ``io.jwt.verify_rs256`` / ``io.jwt.decode_verify`` require
      PyJWT with the cryptography backend; absent → RegoError.
    - ``http.send`` requires an injected transport
      (``rego_to_auth(..., http_send=...)``) — the engine never opens
      network connections itself; absent → RegoError.
    - ``time.now_ns`` uses the injectable ``now_ns`` clock
      (default ``time.time_ns``).

    Duck-types :class:`~swarm_spark.streaming.auth.AuthPolicy` —
    ``authorize(AuthInput)`` raises AuthDenied — so it drops into the
    HTTP frontend's middleware slot unchanged.
    """

    def __init__(
        self,
        defs: dict[str, list[Rule]],
        defaults: dict[str, Any],
        funcs: dict[str, Rule] | None = None,
        http_send=None,
        now_ns=None,
    ):
        import time as _time

        self._defs = defs
        self._defaults = defaults
        self._funcs = funcs or {}
        self._http_send = http_send
        self._now_ns = now_ns or _time.time_ns
        self._validate()

    # -- load-time builtin validation ----------------------------------
    def _iter_calls(self):
        def walk(node):
            if isinstance(node, Call):
                yield node
                for arg in node.args:
                    yield from walk(arg)
            elif isinstance(node, (Eq, Cmp)):
                yield from walk(node.left)
                yield from walk(node.right)
            elif isinstance(node, Bin):
                yield from walk(node.left)
                yield from walk(node.right)
            elif isinstance(node, Assign):
                yield from walk(node.value)
            elif isinstance(node, Index):
                yield from walk(node.obj)
            elif isinstance(node, dict):
                for v in node.values():
                    yield from walk(v)
            elif isinstance(node, list):
                for v in node:
                    yield from walk(v)

        rules = [r for rs in self._defs.values() for r in rs] + list(
            self._funcs.values()
        )
        for rule in rules:
            for stmt in rule.body:
                yield from walk(stmt)
            if rule.value is not None:
                yield from walk(rule.value)

    def _validate(self) -> None:
        for call in self._iter_calls():
            fn = call.fn
            if fn in self._funcs or fn in _PURE_AUTH_BUILTINS:
                continue
            if fn in _JWT_VERIFY_BUILTINS:
                if not _HAS_JWT_CRYPTO:
                    raise RegoError(
                        f"{fn} requires PyJWT with the cryptography backend "
                        "(pip install pyjwt cryptography); rejected at load"
                    )
                continue
            if fn == "http.send":
                if self._http_send is None:
                    raise RegoError(
                        "http.send requires an injected transport "
                        "(rego_to_auth(texts, http_send=...)); the engine "
                        "does not open network connections itself"
                    )
                continue
            raise RegoError(f"unsupported auth builtin {fn!r}")

    # -- evaluation over AuthInput -------------------------------------
    def _input_value(self, a, parts: tuple[str, ...]):
        if parts[0] != "input" or len(parts) < 2:
            raise RegoError(f"auth path must root at input: {'.'.join(parts)}")
        field = parts[1]
        if field in ("method", "path", "remote", "body"):
            if len(parts) != 2:
                raise RegoError(f"scalar input field {field!r} has no sub-keys")
            return getattr(a, field)
        if field in ("header", "query"):
            if len(parts) != 3:
                raise RegoError(f"input.{field} needs exactly one key")
            src = a.header if field == "header" else a.query
            for k, v in src.items():
                if k.lower() == parts[2].lower():
                    return v if isinstance(v, (list, tuple)) else [v]
            return []
        raise RegoError(f"unsupported auth input field {field!r}")

    def _call(self, fn: str, args: list, a, stack):
        if fn in self._funcs:
            rule = self._funcs[fn]
            if len(args) != len(rule.params or ()):
                raise RegoError(f"function {fn!r} expects {rule.params}, got {args}")
            env = dict(zip(rule.params, args))
            for stmt in rule.body:
                if not self._eval_stmt(stmt, a, env, stack):
                    raise _Undefined(f"function {fn!r} body unsatisfied")
            return self._eval_expr(rule.value, a, env, stack)
        if fn == "count":
            return len(args[0])
        if fn == "split":
            return str(args[0]).split(str(args[1]))
        if fn == "lower":
            return str(args[0]).lower()
        if fn == "upper":
            return str(args[0]).upper()
        if fn == "trim_space":
            return str(args[0]).strip()
        if fn in ("startswith", "endswith", "contains"):
            s, sub = str(args[0]), str(args[1])
            return {
                "startswith": s.startswith,
                "endswith": s.endswith,
                "contains": s.__contains__,
            }[fn](sub)
        if fn == "time.now_ns":
            return int(self._now_ns())
        if fn == "io.jwt.decode":
            return _jwt_unverified_decode(str(args[0]))
        if fn == "io.jwt.verify_rs256":
            return self._jwt_verify_rs256(str(args[0]), args[1])
        if fn == "io.jwt.decode_verify":
            return self._jwt_decode_verify(str(args[0]), args[1])
        if fn == "http.send":
            resp = self._http_send(args[0])
            if not isinstance(resp, dict):
                raise RegoError("http.send transport must return a dict")
            return resp
        raise RegoError(f"unsupported auth builtin {fn!r}")

    @staticmethod
    def _jwks_keys(certs):
        """JWKS JSON string / dict → PyJWT key objects; a non-JSON
        string is treated as a PEM key and passed through verbatim.
        Unusable input yields [] (→ verification False), never an
        exception escaping into the request handler."""
        import json as _json

        if isinstance(certs, str):
            try:
                jwks = _json.loads(certs)
            except ValueError:
                return [certs]  # PEM (or garbage: PyJWT will reject it)
        else:
            jwks = certs
        if not isinstance(jwks, dict):
            return []
        keys = []
        for k in jwks.get("keys", []):
            try:
                keys.append(_pyjwt.PyJWK(k).key)
            except Exception:  # unusable key entry — skip, try the rest
                continue
        return keys

    def _jwt_verify_rs256(self, token: str, certs) -> bool:
        """Signature-only verification against a JWKS (OPA's
        ``io.jwt.verify_rs256`` contract — claims are NOT checked)."""
        for key in self._jwks_keys(certs):
            try:
                _pyjwt.decode(
                    token,
                    key=key,
                    algorithms=["RS256"],
                    options={"verify_exp": False, "verify_aud": False},
                )
                return True
            except Exception:
                continue
        return False

    def _jwt_decode_verify(self, token: str, constraints) -> list:
        """OPA ``io.jwt.decode_verify``: [valid, header, payload];
        [false, {}, {}] when verification fails. Supported constraint
        keys: cert (JWKS/PEM), iss, aud, time (ns).

        exp/nbf are checked HERE against ``constraints["time"]`` (ns)
        or the policy's injected ``now_ns`` clock — not PyJWT's
        wall-clock — so pinned-clock tests and offline re-evaluation
        behave like every other time path in this class."""
        if not isinstance(constraints, dict):
            raise RegoError("io.jwt.decode_verify constraints must be an object")
        cert = constraints.get("cert")
        keys = self._jwks_keys(cert) if cert else []
        now_s = float(constraints.get("time", self._now_ns())) / 1e9
        opts = {
            "verify_aud": "aud" in constraints,
            "verify_exp": False,  # checked below against now_s
            "verify_nbf": False,
        }
        kwargs: dict[str, Any] = {"algorithms": ["RS256"], "options": opts}
        if "aud" in constraints:
            kwargs["audience"] = constraints["aud"]
        if "iss" in constraints:
            kwargs["issuer"] = constraints["iss"]
            opts["verify_iss"] = True
        for key in keys:
            try:
                payload = _pyjwt.decode(token, key=key, **kwargs)
                if "exp" in payload and not float(payload["exp"]) > now_s:
                    return [False, {}, {}]
                if "nbf" in payload and float(payload["nbf"]) > now_s:
                    return [False, {}, {}]
                header = _pyjwt.get_unverified_header(token)
                return [True, header, payload]
            except Exception:
                continue
        return [False, {}, {}]

    def _eval_expr(self, e, a, env: dict, stack):
        if isinstance(e, Lit):
            return e.value
        if isinstance(e, dict):
            return {k: self._eval_expr(v, a, env, stack) for k, v in e.items()}
        if isinstance(e, list):
            return [self._eval_expr(v, a, env, stack) for v in e]
        if isinstance(e, Path):
            if e.parts[0] == "input":
                return self._input_value(a, e.parts)
            if e.parts[0] in env:
                val = env[e.parts[0]]
                for part in e.parts[1:]:
                    if not isinstance(val, dict) or part not in val:
                        raise _Undefined(f"missing key {part!r}")
                    val = val[part]
                return val
            if len(e.parts) == 1 and (
                e.parts[0] in self._defs or e.parts[0] in self._defaults
            ):
                return self._eval_bool(e.parts[0], a, stack)
            raise RegoError(f"unknown auth name {'.'.join(e.parts)!r}")
        if isinstance(e, Index):
            obj = self._eval_expr(e.obj, a, env, stack)
            key = e.key
            if isinstance(key, int):
                if not isinstance(obj, (list, tuple)) or not -len(obj) <= key < len(obj):
                    raise _Undefined(f"index {key} out of range")
                return obj[key]
            if isinstance(obj, dict):
                if key not in obj:
                    raise _Undefined(f"missing key {key!r}")
                return obj[key]
            raise _Undefined(f"cannot index {type(obj).__name__} with {key!r}")
        if isinstance(e, Bin):
            left = self._eval_expr(e.left, a, env, stack)
            right = self._eval_expr(e.right, a, env, stack)
            if not isinstance(left, (int, float)) or not isinstance(right, (int, float)):
                raise RegoError(f"arithmetic needs numbers, got {left!r} {e.op} {right!r}")
            if e.op == "+":
                return left + right
            if e.op == "-":
                return left - right
            if e.op == "*":
                return left * right
            if e.op == "/":
                return left / right
            raise RegoError(f"unsupported operator {e.op!r}")
        if isinstance(e, Call):
            args = [self._eval_expr(arg, a, env, stack) for arg in e.args]
            return self._call(e.fn, args, a, stack)
        raise RegoError(f"unsupported auth expression {e!r}")

    def _eval_stmt(self, stmt, a, env: dict, stack: tuple[str, ...]) -> bool:
        if isinstance(stmt, Assign):
            env[stmt.var] = self._eval_expr(stmt.value, a, env, stack)
            return True
        if isinstance(stmt, Eq):
            left, right = stmt.left, stmt.right
            if isinstance(right, Path) and right.fanout:
                left, right = right, left
            if isinstance(left, Path) and left.fanout:
                vals = self._eval_expr(Path(left.parts), a, env, stack)
                return self._eval_expr(right, a, env, stack) in vals
            return self._eval_expr(left, a, env, stack) == self._eval_expr(
                right, a, env, stack
            )
        if isinstance(stmt, Cmp):
            for side in (stmt.left, stmt.right):
                if isinstance(side, Path) and side.fanout:
                    # membership semantics only exist for ==; refusing
                    # loudly beats silently comparing the whole list
                    raise RegoError(
                        f"[_] fan-out is not supported in {stmt.op!r} comparisons"
                    )
            left = self._eval_expr(stmt.left, a, env, stack)
            right = self._eval_expr(stmt.right, a, env, stack)
            import operator as _op

            try:
                return {
                    "!=": _op.ne,
                    "<": _op.lt,
                    ">": _op.gt,
                    "<=": _op.le,
                    ">=": _op.ge,
                }[stmt.op](left, right)
            except TypeError as exc:
                # attacker-typed data (e.g. a JWT claim carrying a
                # string exp): the comparison is undefined, the rule
                # body fails, default-deny decides — never a 500
                raise _Undefined(f"incomparable operands: {exc}") from exc
        if isinstance(stmt, Call):
            return bool(self._call(
                stmt.fn,
                [self._eval_expr(arg, a, env, stack) for arg in stmt.args],
                a,
                stack,
            ))
        if isinstance(stmt, Path) and len(stmt.parts) == 1 and not stmt.fanout:
            name = stmt.parts[0]
            if name in env:
                return bool(env[name])
            return self._eval_bool(name, a, stack)
        raise RegoError(f"unsupported auth statement {stmt!r}")

    def _eval_bool(self, name: str, a, stack: tuple[str, ...] = ()) -> bool:
        """A boolean rule holds iff any of its bodies is satisfied.

        ALL rules for the name are evaluated: when two satisfied
        complete rules produce different values, OPA raises
        eval_conflict_error ("complete rules must not conflict") —
        mirrored here so an allow/deny decision can never silently
        depend on rule declaration order. (Behavior note: this is
        stricter than the pre-r5 short-circuit — a later body whose
        statements are unsupported now raises instead of being skipped
        once an earlier body matched, exactly as OPA would evaluate
        it.) Conflict detection uses OPA's TYPED equality, not
        Python's: ``true`` and ``1`` are distinct values (bool is not
        a number in Rego), while ``1`` and ``1.0`` are equal (one
        number type), recursively through arrays/objects."""
        if name in stack:
            raise RegoError(f"recursive auth rule {name!r}")
        produced: list[Any] = []
        for rule in self._defs.get(name, ()):
            env: dict[str, Any] = {}
            try:
                if all(
                    self._eval_stmt(s, a, env, stack + (name,)) for s in rule.body
                ):
                    v = rule.value
                    produced.append(
                        self._eval_expr(v, a, env, stack + (name,))
                        if v is not None
                        else True
                    )
            except _Undefined:
                continue
        if produced:
            first = _rego_typed_key(produced[0])
            if any(_rego_typed_key(p) != first for p in produced[1:]):
                raise RegoError(
                    f"complete rules must not conflict: {name!r} "
                    f"produced {sorted({repr(p) for p in produced})}"
                )
            return bool(produced[0])
        dflt = self._defaults.get(name)
        if dflt is not None:
            return bool(dflt.value) if isinstance(dflt, Lit) else bool(dflt)
        return False

    def deny(self, a) -> bool:
        # undefined deny (no rule fires, no default) → allow (docs/rule.md)
        return self._eval_bool("deny", a)

    def authorize(self, a) -> None:
        from ..streaming.auth import AuthDenied

        if self.deny(a):
            raise AuthDenied("auth.deny")


def rego_to_auth(
    texts: list[str], *, http_send=None, now_ns=None
) -> RegoAuthPolicy | None:
    """Compile every ``package auth`` module in ``texts``; None if the
    sources define no auth policy (reference default: allow-all).

    ``http_send``: optional transport callable(dict) -> dict for the
    ``http.send`` builtin (e.g. a JWKS fetcher); without it policies
    using http.send are rejected at load. ``now_ns``: injectable clock
    for ``time.now_ns`` (tests pin it; default ``time.time_ns``)."""
    defs: dict[str, list[Rule]] = {}
    defaults: dict[str, Any] = {}
    funcs: dict[str, Rule] = {}
    found = False
    for text in texts:
        mod = parse_rego(text)
        if mod.package != ("auth",):
            continue
        found = True
        for rule in mod.rules:
            if rule.head is not None:
                raise RegoError("auth rules must be boolean/valued, not set rules")
            if rule.params is not None:
                funcs[rule.head_name] = rule
            elif rule.is_default:
                defaults[rule.head_name] = rule.value
            else:
                defs.setdefault(rule.head_name, []).append(rule)
    if not found:
        return None
    return RegoAuthPolicy(defs, defaults, funcs, http_send=http_send, now_ns=now_ns)


def load_rego_auth_dir(path: str, *, http_send=None, now_ns=None) -> RegoAuthPolicy | None:
    """Compile the auth policy from every ``*.rego`` under ``path``
    (non-auth packages are ignored, so a mixed policy dir works)."""
    texts = []
    for p in sorted(_glob.glob(os.path.join(path, "**", "*.rego"), recursive=True)):
        with open(p, encoding="utf-8") as f:
            texts.append(f.read())
    return rego_to_auth(texts, http_send=http_send, now_ns=now_ns)


def load_rego_policies(texts: list[str]) -> tuple[EventRuleSet, SchemaRuleRegistry]:
    """Rego sources → compiled (event rules, schema rules)."""
    return load_rules(rego_to_config(texts))


def load_rego_dir(path: str) -> tuple[EventRuleSet, SchemaRuleRegistry]:
    """Load every ``*.rego`` under ``path`` (the reference's
    ``policy.WithDir`` shape, pkg/infra/policy/client.go:35-60)."""
    texts = []
    for p in sorted(_glob.glob(os.path.join(path, "**", "*.rego"), recursive=True)):
        with open(p, encoding="utf-8") as f:
            texts.append(f.read())
    if not texts:
        raise RegoError(f"no .rego files under {path!r}")
    return load_rego_policies(texts)
