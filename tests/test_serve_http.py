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


@pytest.mark.slow
@pytest.mark.heavy
def test_http_image_family_endpoints():
    """birefnet/depthany/migan REST endpoints over ImageServer (depthany +
    migan exercised live; unloaded families 404)."""
    from PIL import Image as PILImage

    from vision_tpu.core.device import backend_init
    from vision_tpu.models.depth_anything import DepthAnythingModel, DepthAnythingParams
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import (
        random_depth_anything_params,
        random_migan_params,
    )
    from vision_tpu.serve_http import VisionHTTPServer

    dev = backend_init()
    da = DepthAnythingModel(random_depth_anything_params("small"), DepthAnythingParams(), dev)
    mg = MiganModel(random_migan_params(256), MiganParams(resolution=256), dev)

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (98, 98, 3), np.uint8)

    with VisionHTTPServer(depthany_model=da, migan_model=mg, batch_size=2,
                          max_delay_ms=50, port=0) as srv:
        port = srv.port

        status, body, ctype = _post(f"http://127.0.0.1:{port}/v1/depthany", _png(img))
        assert status == 200 and ctype == "image/png"
        depth = PILImage.open(io.BytesIO(body))
        assert depth.size == (98, 98) and depth.mode == "L"

        # migan wants RGBA (alpha = inpaint mask)
        rgba = np.dstack([img, (rng.random((98, 98)) > 0.5).astype(np.uint8) * 255])
        status, body, ctype = _post(f"http://127.0.0.1:{port}/v1/migan", _png(rgba))
        assert status == 200 and ctype == "image/png"
        out = PILImage.open(io.BytesIO(body))
        # flattened to RGB: the model's mask-as-alpha output would render
        # the keep-region transparent in a viewer (review r4c)
        assert out.size == (98, 98) and out.mode == "RGB"

        # an oversized client-declared Content-Length is rejected BEFORE
        # the handler buffers anything (review r4c)
        import urllib.error as _ue
        import urllib.request as _ur

        req = _ur.Request(
            f"http://127.0.0.1:{port}/v1/migan", data=b"x", method="POST",
            headers={"Content-Length": str(1 << 33)},
        )
        try:
            _ur.urlopen(req, timeout=60)
            raise AssertionError("expected 413")
        except _ue.HTTPError as e:
            assert e.code == 413
        except (ConnectionError, _ue.URLError):
            pass  # server may cut the socket after the early 413

        # RGB body to migan is a 400; birefnet is not loaded -> 404
        import urllib.error

        for url, code in ((f"http://127.0.0.1:{port}/v1/migan", 400),
                          (f"http://127.0.0.1:{port}/v1/birefnet", 404)):
            try:
                _post(url, _png(img))
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == code

        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60).read())
        assert {"depthany", "migan"} <= set(health["models"])


@pytest.mark.slow
@pytest.mark.heavy
def test_http_yolo_endpoint():
    """POST /v1/yolo returns JSON detections with class names."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.models.random_weights import random_yolov9t_params
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams
    from vision_tpu.serve_http import VisionHTTPServer

    dev = backend_init()
    model = Yolov9tModel(random_yolov9t_params(), Yolov9tParams(), dev)
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (96, 128, 3), np.uint8)

    with VisionHTTPServer(yolo_model=model, batch_size=2, max_delay_ms=50, port=0) as srv:
        status, body, ctype = _post(
            f"http://127.0.0.1:{srv.port}/v1/yolo?conf=0.01", _png(img))
        assert status == 200 and ctype == "application/json"
        dets = json.loads(body)
        assert isinstance(dets, list)
        for d in dets[:3]:
            assert set(d) == {"box", "confidence", "class_id", "class_name"}
            assert len(d["box"]) == 4


@pytest.mark.slow
@pytest.mark.heavy
def test_http_client_errors_are_400(http_server):
    """Undecodable bodies and malformed params are the CLIENT's fault."""
    import urllib.error
    import urllib.request

    port = http_server.port
    for url, body in (
        (f"http://127.0.0.1:{port}/v1/esrgan", b"this is not an image"),
        (f"http://127.0.0.1:{port}/v1/sam/mask?box=1,2,3",
         _png(np.zeros((24, 32, 3), np.uint8))),
    ):
        try:
            urllib.request.urlopen(urllib.request.Request(url, data=body), timeout=600)
            raise AssertionError(f"{url} accepted a bad request")
        except urllib.error.HTTPError as e:
            assert e.code == 400, (url, e.code)
    # unknown route stays 404 even with a non-image body (route-first)
    try:
        urllib.request.urlopen(
            urllib.request.Request(f"http://127.0.0.1:{port}/v1/nope", data=b"x"), timeout=60
        )
        raise AssertionError("unknown route accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 404
