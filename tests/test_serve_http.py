"""HTTP serving front-end (vision_tpu/serve_http.py): REST endpoints over
the batching servers, driven with stdlib urllib against a live listener."""

import io
import json
import urllib.request

import numpy as np
import pytest


def _png(arr: np.ndarray) -> bytes:
    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


@pytest.fixture(scope="module")
def http_server():
    from vision_tpu.core.device import backend_init
    from vision_tpu.models.esrgan import EsrganModel, EsrganParams
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import (
        random_esrgan_params,
        random_mobile_sam_params,
    )
    from vision_tpu.serve_http import VisionHTTPServer

    dev = backend_init()
    sam = SamModel(
        {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}, SamParams(), dev
    )
    esr = EsrganModel(
        {k: np.asarray(v) for k, v in random_esrgan_params(0, nb=1).items()},
        EsrganParams(scale=4, n_blocks=1),
        dev,
    )
    with VisionHTTPServer(sam_model=sam, esrgan_model=esr, batch_size=2,
                          max_delay_ms=50, port=0) as srv:
        yield srv


@pytest.mark.slow
@pytest.mark.heavy
def test_http_endpoints(http_server):
    from PIL import Image as PILImage

    port = http_server.port
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)

    # healthz before any request
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and {"sam", "esrgan"} <= set(health["models"])

    # esrgan: PNG in -> upscaled PNG out
    status, body, ctype = _post(f"http://127.0.0.1:{port}/v1/esrgan", _png(img))
    assert status == 200 and ctype == "image/png"
    up = PILImage.open(io.BytesIO(body))
    assert up.size == (64 * 4, 48 * 4)

    # sam point mask at the original extent
    status, body, ctype = _post(f"http://127.0.0.1:{port}/v1/sam/mask?x=30&y=20", _png(img))
    assert status == 200 and ctype == "image/png"
    mask = PILImage.open(io.BytesIO(body))
    assert mask.size == (64, 48) and mask.mode == "L"

    # sam box prompt
    status, body, _ = _post(f"http://127.0.0.1:{port}/v1/sam/mask?box=5,5,60,40", _png(img))
    assert status == 200

    # error paths stay JSON
    req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/sam/mask", data=b"", method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised

    # stats reflect the traffic
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["models"]["sam"]["requests"] == 2
    assert health["models"]["esrgan"]["requests"] == 1
    assert health["models"]["sam"]["p50_latency_ms"] > 0
