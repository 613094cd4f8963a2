"""Declarative rule loader (operator C1 — the policy-engine analogue).

The reference's rule language is Rego, loaded from ``.rego`` files and
evaluated per object/record (/root/reference/pkg/infra/policy/
client.go:35-120). The idiomatic Spark replacement is a declarative
config (YAML/JSON/dict) **compiled once into Catalyst expressions** —
rules stay data, evaluation stays JVM-side codegen, and the observed
Rego surface (startswith/endswith predicates, field selection,
``Records[_]`` fan-out, ``json.patch`` removes, timestamp arithmetic —
SURVEY §2.2) maps onto explicit keys:

```yaml
event_rules:
  - name: cloudtrail-logs
    when:                        # all keys AND-ed; any_of for OR
      bucket: my-bucket
      name_prefix: logs/
      name_suffix: .json.gz
      min_size: 1
    sources:
      - {schema: cloudtrail, compress: gzip}

schema_rules:
  - name: cloudtrail
    fanout: Records              # explode this array; '' = record itself
    dataset: my_dataset
    table: cloudtrail            # or {from_field: eventType, prefix: t_}
    partition: month
    id: eventID                  # field path in the (fanned-out) record
    timestamp:                   # one of:
      field: eventTime           #   RFC3339 / date-time string column
      # unix_field: event_time   #   numeric unix seconds
      # scale: 0.001             #   multiply (e.g. ms → s)
    data: record                 # whole record; or {fields: [...]}
    drop: [requestParameters.Host]   # json.patch remove analogue
```
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import ModelError, Source
from .event import (
    BucketIs,
    EventRule,
    EventRuleSet,
    NameContains,
    NameGlob,
    NamePrefix,
    NameSuffix,
    Pred,
    SizeAtLeast,
    TruePred,
)
from .schema_rule import SchemaRule, SchemaRuleRegistry, drop_fields, rule_output

_PRED_KEYS = {
    "bucket": BucketIs,
    "name_prefix": NamePrefix,
    "name_suffix": NameSuffix,
    "name_contains": NameContains,
    "name_glob": NameGlob,
    "min_size": SizeAtLeast,
}


def compile_predicate(spec: dict | None) -> Pred:
    if not spec:
        return TruePred()
    preds: list[Pred] = []
    for key, value in spec.items():
        if key == "any_of":
            if not isinstance(value, list) or not value:
                raise ModelError("any_of requires a non-empty list")
            alt = compile_predicate(value[0])
            for sub in value[1:]:
                alt = alt | compile_predicate(sub)
            preds.append(alt)
        elif key in _PRED_KEYS:
            preds.append(_PRED_KEYS[key](value))
        else:
            raise ModelError(f"unknown predicate key: {key!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _routing_col(spec: Any, record: Column) -> Column | str:
    """A routing value: literal string, or {from_field,prefix,suffix}."""
    if isinstance(spec, str):
        return spec
    if isinstance(spec, dict) and "from_field" in spec:
        out = _field(record, spec["from_field"]).cast("string")
        if spec.get("prefix"):
            out = F.concat(F.lit(spec["prefix"]), out)
        if spec.get("suffix"):
            out = F.concat(out, F.lit(spec["suffix"]))
        return out
    raise ModelError(f"bad routing spec: {spec!r}")


def _field(record: Column, path: str) -> Column:
    col = record
    for part in path.split("."):
        col = col.getItem(part)
    return col


def compile_schema_rule(spec: dict) -> SchemaRule:
    name = spec.get("name")
    if not name:
        raise ModelError("schema rule needs a name")
    fanout = spec.get("fanout", "")
    ts_spec = spec.get("timestamp")
    if not isinstance(ts_spec, dict) or not (
        "field" in ts_spec or "unix_field" in ts_spec
    ):
        raise ModelError(f"rule {name!r}: timestamp needs field or unix_field")
    data_spec = spec.get("data", "record")
    drops = spec.get("drop", [])

    def transform(df: DataFrame) -> DataFrame:
        if fanout:
            rec_df = df.select(F.explode(F.col(fanout)).alias("record"))
            rec = F.col("record")
        else:
            rec_df = df.select(F.struct(*df.columns).alias("record"))
            rec = F.col("record")

        if "unix_field" in ts_spec:
            ts = _field(rec, ts_spec["unix_field"]).cast("double")
        else:
            # timestamp → double keeps fractional seconds (T3 parity)
            ts = F.to_timestamp(_field(rec, ts_spec["field"])).cast("double")
        if ts_spec.get("scale"):
            ts = ts * float(ts_spec["scale"])

        if data_spec == "record":
            data = rec
        elif isinstance(data_spec, dict) and "fields" in data_spec:
            data = F.struct(
                *[_field(rec, f).alias(f.split(".")[-1]) for f in data_spec["fields"]]
            )
        else:
            raise ModelError(f"rule {name!r}: bad data spec {data_spec!r}")
        if drops:
            data = drop_fields(data, *drops)

        id_col = None
        if spec.get("id"):
            id_col = _field(rec, spec["id"]).cast("string")

        return rule_output(
            rec_df,
            dataset=_routing_col(spec.get("dataset"), rec),
            table=_routing_col(spec.get("table"), rec),
            partition=spec.get("partition", ""),
            id=id_col,
            timestamp=ts,
            data=data,
        )

    return SchemaRule(name, transform)


def load_rules(config: dict) -> tuple[EventRuleSet, SchemaRuleRegistry]:
    """Compile a config dict into the two rule registries."""
    events = EventRuleSet()
    for spec in config.get("event_rules", []):
        sources = tuple(
            Source(
                parser=s.get("parser", "json"),
                schema=s.get("schema", ""),
                compress=s.get("compress", ""),
            )
            for s in spec.get("sources", [])
        )
        if not sources:
            raise ModelError(f"event rule {spec.get('name')!r} has no sources")
        events.add(EventRule(spec.get("name", "?"), compile_predicate(spec.get("when")), sources))

    schemas = SchemaRuleRegistry()
    for spec in config.get("schema_rules", []):
        schemas.register(compile_schema_rule(spec))
    return events, schemas


def load_rules_file(path: str) -> tuple[EventRuleSet, SchemaRuleRegistry]:
    """Load rules from a YAML or JSON file."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        config = yaml.safe_load(text)
    else:
        config = json.loads(text)
    return load_rules(config)
