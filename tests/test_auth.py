"""Auth policy (A1) tests — deny-rule semantics over request metadata,
mirroring the examples in the reference's docs/rule.md auth section."""

from __future__ import annotations

import pytest

from swarm_spark.model import ModelError
from swarm_spark.streaming.auth import AuthDenied, AuthInput, AuthPolicy

CONFIG = {
    "deny": [
        {
            "name": "event-path-needs-internal-ip",
            "when": {"path_prefix": "/event/", "remote_not_prefix": "10."},
        },
        {"name": "no-token", "when": {"header_absent": "Authorization"}},
        {
            "name": "bad-token",
            "when": {"header_not_equals": {"name": "Authorization", "value": "Bearer ok"}},
        },
    ]
}


class TestAuthPolicy:
    def test_allow_all_by_default(self):
        AuthPolicy().authorize(AuthInput(path="/anything"))

    def test_deny_matches(self):
        pol = AuthPolicy.from_config(CONFIG)
        with pytest.raises(AuthDenied) as ei:
            pol.authorize(
                AuthInput(path="/event/pubsub/cs", remote="8.8.8.8",
                          header={"Authorization": "Bearer ok"})
            )
        assert ei.value.rule == "event-path-needs-internal-ip"

    def test_pass_when_no_rule_matches(self):
        pol = AuthPolicy.from_config(CONFIG)
        pol.authorize(
            AuthInput(path="/event/pubsub/cs", remote="10.1.2.3",
                      header={"authorization": "Bearer ok"})  # case-insensitive
        )

    def test_header_rules(self):
        pol = AuthPolicy.from_config(CONFIG)
        with pytest.raises(AuthDenied) as ei:
            pol.authorize(AuthInput(remote="10.0.0.1"))
        assert ei.value.rule == "no-token"
        with pytest.raises(AuthDenied) as ei:
            pol.authorize(AuthInput(remote="10.0.0.1", header={"Authorization": "Bearer NO"}))
        assert ei.value.rule == "bad-token"

    def test_bad_config(self):
        with pytest.raises(ModelError):
            AuthPolicy.from_config({"deny": [{"name": "x", "when": {"astral": 1}}]})
        with pytest.raises(ModelError):
            AuthPolicy.from_config({"deny": [{"name": "x", "when": {}}]})
