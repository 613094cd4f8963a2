"""Unit tests for the reference-parity core semantics (no Spark needed).

Mirrors the reference's table-driven tests:
- strip: /root/reference/pkg/usecase/utils_test.go:11-85 (fixture F7)
- merge: pkg/usecase/migrate_test.go:77-132 (fixture F6)
- id:    pkg/domain/types/types_test.go TestNewLogIDIdempotent
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from swarm_spark.functions.ids import canonical_json, go_format_float, log_id
from swarm_spark.schema.infer import infer_batch_schema, infer_record_schema
from swarm_spark.schema.merge import SchemaConflictError, merge_schemas, schemas_equal
from swarm_spark.schema.strip import strip_record


class TestStrip:
    # golden cases from FIXTURES.md F7
    def test_null_field_dropped(self):
        assert strip_record({"field": None, "color": "blue"}) == {"color": "blue"}

    def test_nested_null_keeps_empty_struct(self):
        assert strip_record({"nested": {"sub": None}, "color": "blue"}) == {
            "nested": {},
            "color": "blue",
        }

    def test_empty_array_dropped(self):
        assert strip_record({"array": [], "color": "blue"}) == {"color": "blue"}

    def test_null_in_list_dropped(self):
        assert strip_record([None, "blue"]) == ["blue"]

    def test_empty_map_dropped(self):
        assert strip_record({"empty": {}, "color": "blue"}) == {"color": "blue"}

    def test_deep_nesting(self):
        rec = {"a": {"b": {"c": None, "d": 1}, "e": []}, "f": [1, None, {"g": None}]}
        assert strip_record(rec) == {"a": {"b": {"d": 1}}, "f": [1, {}]}


def s(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


class TestMerge:
    def test_union_appends_new_preserves_order(self):
        # migrate_test.go:77-113: {name,age} into {name,address} → {name,address,age}
        old = s(("name", T.StringType()), ("address", T.StringType()))
        new = s(("name", T.StringType()), ("age", T.LongType()))
        merged = merge_schemas(old, new)
        assert [f.name for f in merged.fields] == ["name", "address", "age"]

    def test_conflict_raises(self):
        # migrate_test.go:115-132: INTEGER vs STRING on same name → error
        old = s(("age", T.LongType()))
        new = s(("age", T.StringType()))
        with pytest.raises(SchemaConflictError):
            merge_schemas(old, new)

    def test_nested_union(self):
        old = s(("d", s(("x", T.StringType()))))
        new = s(("d", s(("y", T.LongType()))))
        merged = merge_schemas(old, new)
        inner = merged["d"].dataType
        assert [f.name for f in inner.fields] == ["x", "y"]

    def test_array_struct_union(self):
        old = s(("a", T.ArrayType(s(("x", T.StringType())))))
        new = s(("a", T.ArrayType(s(("y", T.StringType())))))
        merged = merge_schemas(old, new)
        assert [f.name for f in merged["a"].dataType.elementType.fields] == ["x", "y"]

    def test_evolution_sequence_f6(self):
        # client_test.go:41-115: {red,blue} → +{orange} → +{black}
        t1 = s(("red", T.StringType()), ("blue", T.StringType()))
        t2 = merge_schemas(t1, s(("red", T.StringType()), ("orange", T.StringType())))
        t3 = merge_schemas(t2, s(("black", T.StringType())))
        assert [f.name for f in t3.fields] == ["red", "blue", "orange", "black"]

    def test_equal_ignores_nullability(self):
        a = T.StructType([T.StructField("x", T.StringType(), False)])
        b = T.StructType([T.StructField("x", T.StringType(), True)])
        assert schemas_equal(a, b)


class TestGoFloat:
    @pytest.mark.parametrize(
        "value,expected",
        [
            (3.0, "3"),
            (0.1, "0.1"),
            (-2.5, "-2.5"),
            (0.0, "0"),
            (1e20, "100000000000000000000"),
            (1e21, "1e+21"),
            (1.5e21, "1.5e+21"),
            (1e-6, "0.000001"),
            (1e-7, "1e-7"),
            (5.5e-8, "5.5e-8"),
            (1.234567890123e9, "1234567890.123"),
            (1559347200.25, "1559347200.25"),
        ],
    )
    def test_format(self, value, expected):
        assert go_format_float(value) == expected


class TestCanonicalJson:
    def test_sorted_compact(self):
        assert canonical_json({"b": 1, "a": {"d": True, "c": None}}) == (
            '{"a":{"c":null,"d":true},"b":1}'
        )

    def test_html_escape(self):
        assert canonical_json({"k": "<a&b>"}) == '{"k":"\\u003ca\\u0026b\\u003e"}'

    def test_float_whole_number(self):
        # Go marshals float64(3) as "3" — decoded-JSON ints behave alike
        assert canonical_json({"n": 3.0}) == '{"n":3}'

    def test_id_idempotent_and_order_insensitive(self):
        a = {"x": 1, "y": ["p", "q"], "z": {"k": "v"}}
        b = {"z": {"k": "v"}, "y": ["p", "q"], "x": 1}
        assert log_id(a) == log_id(b)
        assert log_id(a) == log_id(a)
        assert len(log_id(a)) == 32

    def test_unicode_raw(self):
        assert canonical_json({"s": "日本語"}) == '{"s":"日本語"}'


class TestInfer:
    def test_basic_types(self):
        sc = infer_record_schema({"s": "x", "i": 1, "f": 1.5, "b": True})
        assert sc["s"].dataType == T.StringType()
        assert sc["i"].dataType == T.LongType()
        assert sc["f"].dataType == T.DoubleType()
        assert sc["b"].dataType == T.BooleanType()

    def test_nested_and_array(self):
        sc = infer_record_schema({"o": {"a": 1}, "arr": [{"x": "y"}]})
        assert isinstance(sc["o"].dataType, T.StructType)
        assert isinstance(sc["arr"].dataType, T.ArrayType)

    def test_heterogeneous_array_struct_union(self):
        # FIXTURES.md F2 `resources`: first element lacks accountId
        sc = infer_record_schema(
            {"resources": [{"type": "t", "ARN": "a"}, {"accountId": "1", "type": "t", "ARN": "a"}]}
        )
        names = [f.name for f in sc["resources"].dataType.elementType.fields]
        assert names == ["type", "ARN", "accountId"]

    def test_batch_fold(self):
        sc = infer_batch_schema([{"a": 1}, {"b": "x"}, {"a": 2, "c": {"d": 1.5}}])
        assert [f.name for f in sc.fields] == ["a", "b", "c"]

    def test_conflict(self):
        with pytest.raises(SchemaConflictError):
            infer_batch_schema([{"a": 1}, {"a": "x"}])
