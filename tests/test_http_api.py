"""HTTP layer over the Index facade (ref: http/*.go handlers)."""

import json
import shutil
import urllib.request

import pytest

from bleve_spark.http_api import HttpServer

BASE = "/tmp/bleve_spark_http_test"


def call(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    with HttpServer(spark, BASE) as srv:
        yield srv


def test_http_lifecycle(server):
    p = server.port
    assert call(p, "GET", "/api") == (200, {"indexes": []})
    assert call(p, "PUT", "/api/t1")[0] == 201
    assert call(p, "GET", "/api")[1] == {"indexes": ["t1"]}
    # index two docs
    assert call(p, "PUT", "/api/t1/a", {"body": "red fox runs"})[0] == 201
    assert call(p, "PUT", "/api/t1/b", {"body": "blue cow sleeps"})[0] == 201
    code, counted = call(p, "GET", "/api/t1/_count")
    assert (code, counted["count"]) == (200, 2)
    # fetch
    code, doc = call(p, "GET", "/api/t1/a")
    assert code == 200 and doc["fields"]["body"] == "red fox runs"
    assert call(p, "GET", "/api/t1/zzz")[0] == 404
    # search (bleve JSON query)
    code, res = call(
        p, "POST", "/api/t1/_search", {"query": {"term": "fox"}, "size": 5}
    )
    assert code == 200 and res["total_hits"] == 1
    assert res["hits"][0]["id"] == "a" and res["hits"][0]["score"] > 0
    # fields
    assert "body" in call(p, "GET", "/api/t1/_fields")[1]["fields"]
    # delete doc
    assert call(p, "DELETE", "/api/t1/a")[0] == 200
    code, res2 = call(p, "POST", "/api/t1/_search", {"query": {"term": "fox"}})
    assert res2["total_hits"] == 0
    # errors
    assert call(p, "PUT", "/api/t1")[0] == 400  # already exists -> KeyError? see below
    assert call(p, "GET", "/api/nope")[0] == 404
    # delete index
    assert call(p, "DELETE", "/api/t1")[0] == 200
    assert call(p, "GET", "/api")[1] == {"indexes": []}
