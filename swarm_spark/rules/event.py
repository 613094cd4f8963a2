"""Event rules (operator R1): object-metadata routing.

Reference: Rego ``data.event`` evaluated over Object metadata yields a
*set* of Sources — 0 sources skips (or errors on) the object, N sources
parse it N ways (/root/reference/pkg/usecase/event.go:11-21,
docs/rule.md:27-87). Observed predicates in shipped rules are
bucket equality and name startswith/endswith
(pkg/usecase/testdata/policy/event.rego:1-20).

Spark-first design: predicates are a tiny AST that evaluates BOTH ways —

- driver-side over :class:`ObjectMeta` (the streaming/serve path: one
  notification, no reason to spin a job), and
- as a Catalyst ``Column`` over a *listing DataFrame* (the backfill
  path: at 100 TB a bucket listing is millions of rows; routing must be
  a distributed filter, not a Python loop).

The listing DataFrame contract: columns ``bucket, name, size,
created_at`` (see sources.objects.listing_df).
"""

from __future__ import annotations

from dataclasses import dataclass
from fnmatch import fnmatchcase
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import ModelError, ObjectMeta, Source


class Pred:
    """Predicate over object metadata; evaluable in Python and Catalyst."""

    def __call__(self, obj: ObjectMeta) -> bool:
        raise NotImplementedError

    def column(self) -> Column:
        raise NotImplementedError

    def __and__(self, other: "Pred") -> "Pred":
        return _And(self, other)

    def __or__(self, other: "Pred") -> "Pred":
        return _Or(self, other)

    def __invert__(self) -> "Pred":
        return _Not(self)


@dataclass
class _And(Pred):
    a: Pred
    b: Pred

    def __call__(self, obj):
        return self.a(obj) and self.b(obj)

    def column(self):
        return self.a.column() & self.b.column()


@dataclass
class _Or(Pred):
    a: Pred
    b: Pred

    def __call__(self, obj):
        return self.a(obj) or self.b(obj)

    def column(self):
        return self.a.column() | self.b.column()


@dataclass
class _Not(Pred):
    a: Pred

    def __call__(self, obj):
        return not self.a(obj)

    def column(self):
        return ~self.a.column()


@dataclass
class BucketIs(Pred):
    bucket: str

    def __call__(self, obj):
        return obj.bucket == self.bucket

    def column(self):
        return F.col("bucket") == self.bucket


@dataclass
class NamePrefix(Pred):
    prefix: str

    def __call__(self, obj):
        return obj.name.startswith(self.prefix)

    def column(self):
        return F.col("name").startswith(self.prefix)


@dataclass
class NameSuffix(Pred):
    suffix: str

    def __call__(self, obj):
        return obj.name.endswith(self.suffix)

    def column(self):
        return F.col("name").endswith(self.suffix)


@dataclass
class NameContains(Pred):
    sub: str

    def __call__(self, obj):
        return self.sub in obj.name

    def column(self):
        return F.col("name").contains(self.sub)


@dataclass
class NameGlob(Pred):
    pattern: str

    def __call__(self, obj):
        return fnmatchcase(obj.name, self.pattern)

    def column(self):
        # translate glob to SQL LIKE (supports * and ? only)
        if "[" in self.pattern:
            raise ModelError("NameGlob: character classes not supported")
        like = (
            self.pattern.replace("\\", "\\\\")
            .replace("%", "\\%")
            .replace("_", "\\_")
            .replace("*", "%")
            .replace("?", "_")
        )
        return F.col("name").like(like)


@dataclass
class SizeAtLeast(Pred):
    size: int

    def __call__(self, obj):
        return obj.size >= self.size

    def column(self):
        return F.col("size") >= self.size


class TruePred(Pred):
    def __call__(self, obj):
        return True

    def column(self):
        return F.lit(True)


@dataclass(frozen=True)
class EventRule:
    """One routing rule: predicate → parse directives."""

    name: str
    when: Pred
    sources: tuple[Source, ...]

    def __post_init__(self):
        for s in self.sources:
            s.validate()


class NoRuleMatchError(ModelError):
    """No event rule matched an object (reference: ErrNoPolicyResult)."""


class EventRuleSet:
    """Ordered rule collection; all matching rules contribute sources."""

    def __init__(self, rules: list[EventRule] | None = None):
        self.rules: list[EventRule] = list(rules or [])

    def add(self, rule: EventRule) -> "EventRuleSet":
        self.rules.append(rule)
        return self

    def match(self, obj: ObjectMeta, strict: bool = True) -> list[Source]:
        out: list[Source] = []
        for r in self.rules:
            if r.when(obj):
                out.extend(r.sources)
        if not out and strict:
            raise NoRuleMatchError(f"no event rule matched {obj.url}")
        return out

    def route_listing(self, listing, strict: bool = False):
        """Distributed routing over a listing DataFrame.

        Returns a DataFrame ``listing ⋈ (schema, parser, compress)`` —
        one row per (object, matched source). This is the scale path:
        predicate evaluation stays in codegen'd Catalyst expressions and
        the unmatched objects are dropped by a filter, never read.
        """
        outs = []
        for r in self.rules:
            for s in r.sources:
                outs.append(
                    listing.where(r.when.column()).select(
                        "*",
                        F.lit(s.schema).alias("schema"),
                        F.lit(s.parser).alias("parser"),
                        F.lit(s.compress).alias("compress"),
                    )
                )
        if not outs:
            raise NoRuleMatchError("empty rule set")
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result


# convenience constructors, mirroring the rego patterns in docs/rule.md
def bucket(b: str) -> Pred:
    return BucketIs(b)


def name_prefix(p: str) -> Pred:
    return NamePrefix(p)


def name_suffix(s: str) -> Pred:
    return NameSuffix(s)
