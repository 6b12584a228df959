"""Model-serving endpoint tests."""

import http.client
import json
import threading

import numpy as np
import pytest

from mfgp_tpu.models.gp import GP
from mfgp_tpu.serve import ModelServer, make_http_server


@pytest.fixture(scope="module")
def server_addr(rng_module):
    X = rng_module.uniform(0, 10, (30, 3))
    y = np.sin(X[:, 0]) + 0.1 * rng_module.standard_normal(30)
    gp = GP(X, y, jitter=1e-8)
    srv = make_http_server(ModelServer(gp), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def _req(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr)
    conn.request(method, path, body=json.dumps(body) if body else None)
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def test_health(server_addr):
    code, out = _req(server_addr, "GET", "/health")
    assert code == 200 and out["status"] == "ok" and out["n"] == 30


def test_predict_roundtrip(server_addr, rng_module):
    pts = rng_module.uniform(0, 10, (7, 3)).tolist()
    code, out = _req(server_addr, "POST", "/predict", {"points": pts})
    assert code == 200
    assert len(out["mean"]) == 7 and len(out["var"]) == 7
    assert all(v > 0 for v in out["var"])


def test_eid_normalized(server_addr, rng_module):
    pts = rng_module.uniform(0, 10, (12, 3)).tolist()
    code, out = _req(server_addr, "POST", "/eid", {"points": pts})
    assert code == 200
    assert abs(sum(out["eid"]) - 1.0) < 1e-6


def test_bad_requests(server_addr):
    code, out = _req(server_addr, "POST", "/predict", {"points": []})
    assert code == 400
    code, out = _req(server_addr, "POST", "/nope", {"points": [[0, 0, 0]]})
    assert code == 400


def test_server_from_checkpoint(tmp_path, rng_module):
    from mfgp_tpu.serve import ModelServer
    from mfgp_tpu.utils import checkpoint as ckpt

    X = rng_module.uniform(0, 5, (20, 3))
    y = np.cos(X[:, 1])
    gp = GP(X, y, jitter=1e-8)
    ck = ckpt.ExplorationCheckpoint(
        plan_num=0, t_now=0.0, planned_budget=0.0,
        x0=np.zeros((2, 1)), model=ckpt.capture_model(gp),
        data_rows=np.zeros((0, 9)),
        rng_state=np.random.default_rng(0).bit_generator.state,
        jax_key_data=np.zeros(2, np.uint32))
    ckpt.save_checkpoint(str(tmp_path / "m"), ck)
    srv = ModelServer.from_checkpoint(str(tmp_path / "m"))
    out = srv.handle("/predict", {"points": X[:3].tolist()})
    np.testing.assert_allclose(out["mean"],
                               np.asarray(gp.predict(X[:3])[0]), rtol=1e-6)
