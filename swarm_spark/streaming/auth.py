"""Request authorization policy (operator A1).

Reference: Rego ``data.auth`` evaluated over
``{method, path, remote, query, header, body}``; any populated ``deny``
set rejects the request (/root/reference/pkg/usecase/auth.go:16-43,
docs/rule.md:184-283). Default is allow-all (no policy configured).

Engine-side equivalent: deny rules as declarative specs compiled once
to predicates over an :class:`AuthInput`. This guards whatever control
plane fronts the processor (HTTP server, admin CLI); it is driver-side
only and never touches the data path.

Config shape::

    deny:
      - name: non-google-ip
        when:
          path_prefix: /event/
          remote_not_prefix: "10."
      - name: no-token
        when:
          header_absent: authorization
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ..model import ModelError


@dataclass(frozen=True)
class AuthInput:
    method: str = "POST"
    path: str = "/"
    remote: str = ""
    query: dict = field(default_factory=dict)
    header: dict = field(default_factory=dict)
    body: Any = None

    def header_get(self, name: str) -> str | None:
        for k, v in self.header.items():
            if k.lower() == name.lower():
                return v
        return None


class AuthDenied(PermissionError):
    def __init__(self, rule: str):
        self.rule = rule
        super().__init__(f"denied by rule {rule!r}")


_COND_KEYS: dict[str, Callable[[Any], Callable[[AuthInput], bool]]] = {
    "method": lambda v: lambda a: a.method.upper() == str(v).upper(),
    "path_prefix": lambda v: lambda a: a.path.startswith(v),
    "path": lambda v: lambda a: a.path == v,
    "remote_prefix": lambda v: lambda a: a.remote.startswith(v),
    "remote_not_prefix": lambda v: lambda a: not a.remote.startswith(v),
    "header_absent": lambda v: lambda a: a.header_get(v) is None,
    "header_equals": lambda v: lambda a: a.header_get(v["name"]) == v["value"],
    "header_not_equals": lambda v: lambda a: a.header_get(v["name"]) != v["value"],
}


@dataclass(frozen=True)
class DenyRule:
    name: str
    conds: tuple[Callable[[AuthInput], bool], ...]

    def matches(self, a: AuthInput) -> bool:
        return all(c(a) for c in self.conds)


class AuthPolicy:
    """Compiled deny rules; ``authorize`` raises on the first match."""

    def __init__(self, rules: list[DenyRule] | None = None):
        self.rules = list(rules or [])

    @classmethod
    def from_config(cls, config: dict) -> "AuthPolicy":
        rules = []
        for spec in config.get("deny", []):
            conds = []
            for key, value in (spec.get("when") or {}).items():
                if key not in _COND_KEYS:
                    raise ModelError(f"unknown auth condition: {key!r}")
                conds.append(_COND_KEYS[key](value))
            if not conds:
                raise ModelError(f"deny rule {spec.get('name')!r} has no conditions")
            rules.append(DenyRule(spec.get("name", "?"), tuple(conds)))
        return cls(rules)

    def authorize(self, a: AuthInput) -> None:
        for r in self.rules:
            if r.matches(a):
                raise AuthDenied(r.name)
