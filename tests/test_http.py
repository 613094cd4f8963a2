"""HTTP serve frontend: status mapping, auth middleware, exactly-once
behavior over real HTTP, and replay of the reference server's own
golden Pub/Sub push fixtures
(/root/reference/pkg/controller/server/testdata/http/*.json, asserted
to the same expectations as its server_test.go)."""

from __future__ import annotations

import base64
import json
import os
import urllib.error
import urllib.request

import pytest

from swarm_spark.model import ObjectMeta
from swarm_spark.streaming import AuthPolicy, NotificationProcessor, ServeFrontend, StateStore

REF_HTTP_DIR = "/root/reference/pkg/controller/server/testdata/http"


class FakePipeline:
    """Duck-typed IngestPipeline: records calls (the reference's
    usecase.Mock shape)."""

    def __init__(self, fail: Exception | None = None):
        self.calls: list[list[ObjectMeta]] = []
        self.fail = fail

    def load_objects(self, objs):
        self.calls.append(objs)
        if self.fail:
            raise self.fail
        return None


def _post(url, body: bytes, headers: dict | None = None):
    req = urllib.request.Request(url, data=body, method="POST", headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _push_body(msg_id: str, payload: dict) -> bytes:
    return json.dumps(
        {
            "message": {
                "message_id": msg_id,
                "data": base64.b64encode(json.dumps(payload).encode()).decode(),
            },
            "subscription": "projects/p/subscriptions/s",
        }
    ).encode()


@pytest.fixture()
def frontend(tmp_path):
    def make(pipeline, auth=None):
        proc = NotificationProcessor(pipeline, StateStore(str(tmp_path / "states")))
        return ServeFrontend(proc, auth=auth)

    return make


class TestRoutes:
    def test_status_contract(self, frontend):
        pipe = FakePipeline()
        with frontend(pipe) as fe:
            host, port = fe.address
            base = f"http://{host}:{port}"
            assert _get(f"{base}/health") == (200, "OK")
            assert _post(f"{base}/invalid", b"{}")[0] == 404
            assert _get(f"{base}/event/pubsub/cs")[0] == 405
            assert _post(f"{base}/event/pubsub/cs", b"not json")[0] == 400
            # valid JSON, wrong shape: 400, not a handler-thread crash
            assert _post(f"{base}/event/pubsub/cs", b"[]")[0] == 400
            assert _post(f"{base}/event/pubsub/cs", b'"x"')[0] == 400

            ev = {"bucket": "b", "name": "x.log", "size": "3"}
            code, text = _post(f"{base}/event/pubsub/cs", _push_body("m1", ev))
            assert (code, text) == (200, "OK")
            assert len(pipe.calls) == 1
            assert pipe.calls[0][0].bucket == "b"

            # duplicate delivery of the same message id: consumed, no re-run
            code, _ = _post(f"{base}/event/pubsub/cs", _push_body("m1", ev))
            assert code == 200
            assert len(pipe.calls) == 1

    def test_transient_failure_is_205(self, frontend):
        pipe = FakePipeline(fail=RuntimeError("boom"))
        with frontend(pipe) as fe:
            host, port = fe.address
            ev = {"bucket": "b", "name": "x.log"}
            code, _ = _post(f"http://{host}:{port}/event/pubsub/cs", _push_body("m2", ev))
            assert code == 205  # never ack on failure; Pub/Sub redelivers

    def test_auth_denies_401(self, frontend):
        auth = AuthPolicy.from_config(
            {"deny": [{"name": "no-token", "when": {"header_absent": "authorization"}}]}
        )
        pipe = FakePipeline()
        with frontend(pipe, auth=auth) as fe:
            host, port = fe.address
            code, text = _post(
                f"http://{host}:{port}/event/pubsub/cs", _push_body("m3", {"bucket": "b", "name": "n"})
            )
            assert code == 401 and "no-token" in text
            assert pipe.calls == []

    def test_reference_rego_auth_as_middleware(self, frontend):
        """The reference's own auth_token.rego (middleware_test.go
        fixture), compiled by the Rego-subset loader, gating the HTTP
        frontend: good token passes, bad/absent token is 401 (middleware.go contract)."""
        import os as _os

        rego_path = (
            "/root/reference/pkg/controller/server/testdata/policy/auth_token.rego"
        )
        if not _os.path.isfile(rego_path):
            pytest.skip("reference checkout absent")
        from swarm_spark.rules import rego_to_auth

        with open(rego_path, encoding="utf-8") as f:
            auth = rego_to_auth([f.read()])
        pipe = FakePipeline()
        with frontend(pipe, auth=auth) as fe:
            host, port = fe.address
            base = f"http://{host}:{port}/event/pubsub/cs"
            body = _push_body("mra", {"bucket": "b", "name": "x.log"})
            assert _post(base, body)[0] == 401
            code, _ = _post(base, body, {"Authorization": "Bearer bad"})
            assert code == 401
            code, _ = _post(base, body, {"Authorization": "Bearer good-token"})
            assert code == 200
            assert len(pipe.calls) == 1


@pytest.mark.skipif(not os.path.isdir(REF_HTTP_DIR), reason="reference checkout absent")
class TestReferenceFixtures:
    """Replay the reference's golden HTTP fixtures; assert the same
    parse results its server_test.go pins."""

    def _replay(self, frontend, name):
        pipe = FakePipeline()
        with frontend(pipe) as fe:
            host, port = fe.address
            body = open(os.path.join(REF_HTTP_DIR, name), "rb").read()
            path = "/event/pubsub/swarm" if "swarm" in name else "/event/pubsub/cs"
            code, text = _post(f"http://{host}:{port}{path}", body)
        return code, text, pipe

    def test_pubsub_cs_fixture(self, frontend):
        code, text, pipe = self._replay(frontend, "pubsub.json")
        assert (code, text) == (200, "OK")
        (objs,) = pipe.calls
        assert len(objs) == 1
        assert objs[0].bucket == "mztn-sample-bucket"
        assert objs[0].name == "mydir/GA1ZivRbQAAAyXs.jpg"

    def test_pubsub_swarm_fixture(self, frontend):
        code, text, pipe = self._replay(frontend, "pubsub_swarm.json")
        assert (code, text) == (200, "OK")
        (objs,) = pipe.calls
        assert len(objs) == 6
        assert all(o.bucket == "mztn-sample-bucket" for o in objs)
        assert all(o.name.endswith(".json.log.gz") for o in objs)

    def test_eventarc_direct_fixture(self, frontend):
        pipe = FakePipeline()
        with frontend(pipe) as fe:
            host, port = fe.address
            body = open(os.path.join(REF_HTTP_DIR, "eventarc_direct.json"), "rb").read()
            code, text = _post(f"http://{host}:{port}/event/eventarc", body)
            assert (code, text) == (200, "OK")
            (objs,) = pipe.calls
            assert objs[0].bucket == "mizutani-test"
            # same object generation redelivered: idempotent no-op
            code, _ = _post(f"http://{host}:{port}/event/eventarc", body)
            assert code == 200
            assert len(pipe.calls) == 1
