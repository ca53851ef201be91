"""Batched request serving (vision_tpu/serve.py).

The reference engine is single-request (vision.cpp:36-95); the serving
facade groups concurrent requests into fixed-shape device programs. These
tests drive the generic BatchServer with plain Python functions and the
SamServer end-to-end on random production-shaped weights (CPU, f32).
"""

import threading
import time

import numpy as np
import pytest

from vision_tpu.serve import BatchServer


def test_batch_server_orders_results():
    calls = []

    def fn(items):
        calls.append(list(items))
        return [x * 2 for x in items]

    with BatchServer(fn, batch_size=4, max_delay_ms=20) as srv:
        futs = [srv.submit(i) for i in range(10)]
        results = [f.result(timeout=10) for f in futs]
    assert results == [i * 2 for i in range(10)]
    assert sum(len(c) for c in calls) == 10
    assert all(len(c) <= 4 for c in calls)
    assert srv.stats.requests == 10
    assert srv.stats.batches == len(calls)
    assert srv.stats.occupancy > 1.0  # at least some grouping happened


def test_batch_server_groups_concurrent_requests():
    def slow_fn(items):
        time.sleep(0.01)
        return items

    with BatchServer(slow_fn, batch_size=8, max_delay_ms=100) as srv:
        futs = []

        def client(i):
            futs.append(srv.submit(i))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(f.result(timeout=10) for f in futs) == list(range(8))
    # 8 concurrent requests within one 100 ms window -> few (ideally 1) batches
    assert srv.stats.batches <= 3


def test_batch_server_buckets_never_mix():
    seen = []

    def fn(items):
        seen.append(list(items))
        assert len({x % 2 for x in items}) == 1, "mixed shape buckets in one batch"
        return items

    with BatchServer(fn, batch_size=4, max_delay_ms=20, bucket_key=lambda x: x % 2) as srv:
        futs = [srv.submit(i) for i in range(9)]
        assert [f.result(timeout=10) for f in futs] == list(range(9))


def test_batch_server_propagates_exceptions():
    def fn(items):
        raise ValueError("boom")

    with BatchServer(fn, batch_size=2, max_delay_ms=5) as srv:
        fut = srv.submit(1)
        with pytest.raises(ValueError, match="boom"):
            fut.result(timeout=10)
    # server survives a failing batch
    assert srv.stats.batches == 0


def test_batch_server_close_drains_pending():
    def fn(items):
        time.sleep(0.005)
        return items

    srv = BatchServer(fn, batch_size=4, max_delay_ms=1)
    futs = [srv.submit(i) for i in range(17)]
    srv.close()
    assert [f.result(timeout=1) for f in futs] == list(range(17))
    with pytest.raises(RuntimeError):
        srv.submit(99)


def test_batch_server_result_count_mismatch():
    def fn(items):
        return items[:-1] if len(items) > 1 else items

    with BatchServer(fn, batch_size=2, max_delay_ms=50) as srv:
        f1, f2 = srv.submit(1), srv.submit(2)
        with pytest.raises(RuntimeError, match="results"):
            f1.result(timeout=10)
        with pytest.raises(RuntimeError):
            f2.result(timeout=10)


def test_batch_server_prep_pool_occupancy():
    """A single-threaded client with slow host-side prep still fills the
    batch: prepare runs on the prep pool, so submit() returns immediately
    and all 8 requests land inside one batch window."""

    def prep(x):
        time.sleep(0.02)
        return x

    with BatchServer(
        lambda items: items, batch_size=8, max_delay_ms=2000, prepare=prep, prep_workers=8
    ) as srv:
        futs = [srv.submit(i) for i in range(8)]
        assert sorted(f.result(timeout=10) for f in futs) == list(range(8))
    assert srv.stats.occupancy >= 6.0, srv.stats
    assert srv.stats.p50_latency_ms > 0.0
    assert srv.stats.p99_latency_ms >= srv.stats.p50_latency_ms


def test_batch_server_prepare_exception_travels_to_caller():
    def prep(x):
        raise ValueError("bad input")

    with BatchServer(lambda items: items, batch_size=2, max_delay_ms=5, prepare=prep) as srv:
        fut = srv.submit(1)
        with pytest.raises(ValueError, match="bad input"):
            fut.result(timeout=10)


def test_batch_server_survives_cancelled_future():
    """A client cancelling its Future must not kill the batch worker:
    set_result on a cancelled Future raises InvalidStateError, which used
    to unwind the worker thread and hang every later request."""

    def fn(items):
        time.sleep(0.02)
        return items

    with BatchServer(fn, batch_size=4, max_delay_ms=1) as srv:
        futs = [srv.submit(i) for i in range(8)]
        cancelled = sum(1 for f in futs[:4] if f.cancel())
        # server still serves new requests afterwards
        assert srv.compute(99) == 99
        for f in futs:
            if not f.cancelled():
                assert f.result(timeout=10) in range(8)
        assert cancelled >= 0  # cancellation racing dispatch is fine either way


def test_batch_server_survives_bad_bucket_key():
    """A bucket_key that raises for one item delivers the exception to THAT
    caller and keeps the worker alive (it used to kill the thread and hang
    every pending request + deadlock close())."""

    def key(item):
        if item == "bad":
            raise ValueError("unkeyable")
        return None

    with BatchServer(lambda items: items, batch_size=2, max_delay_ms=5, bucket_key=key) as srv:
        bad = srv.submit("bad")
        good = srv.submit("good")
        with pytest.raises(ValueError, match="unkeyable"):
            bad.result(timeout=10)
        assert good.result(timeout=10) == "good"


def test_batch_server_partial_bucket_keeps_its_window():
    """One bucket filling must not flush a partial sibling bucket that is
    still inside its own max_delay window (per-bucket deadlines)."""
    def fn(items):
        return items

    with BatchServer(fn, batch_size=2, max_delay_ms=5000, bucket_key=lambda x: x % 2) as srv:
        f_odd = srv.submit(1)          # partial odd bucket opens its window
        f_e1, f_e2 = srv.submit(2), srv.submit(4)  # even bucket FILLS
        assert f_e1.result(timeout=10) == 2 and f_e2.result(timeout=10) == 4
        # odd bucket must still be waiting inside its own 5 s window
        assert not f_odd.done()
        f_odd2 = srv.submit(3)          # second odd item -> fills -> dispatch
        assert f_odd.result(timeout=10) == 1 and f_odd2.result(timeout=10) == 3
    assert srv.stats.batches == 2


def test_batch_server_close_race_resolves_all():
    """submit() racing close(): every future that submit() returned must
    resolve — an entry landing behind the shutdown sentinel used to hang."""
    for _ in range(20):
        srv = BatchServer(lambda items: items, batch_size=4, max_delay_ms=1)
        futs = []

        def client():
            for i in range(50):
                try:
                    futs.append(srv.submit(i))
                except RuntimeError:
                    return

        t = threading.Thread(target=client)
        t.start()
        time.sleep(0.002)
        srv.close()
        t.join()
        for f in futs:
            f.result(timeout=5)  # must not hang


@pytest.mark.slow
@pytest.mark.heavy
def test_two_model_server_smoke():
    """SAM + ESRGAN servers coexisting in one process: requests to both
    interleave and each model's batcher groups only its own requests."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.esrgan import EsrganModel, EsrganParams
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import (
        random_esrgan_params,
        random_mobile_sam_params,
    )
    from vision_tpu.serve import EsrganServer, SamServer

    dev = backend_init()
    sam = SamModel(
        {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}, SamParams(), dev
    )
    esr = EsrganModel(
        {k: np.asarray(v) for k, v in random_esrgan_params(0, nb=2).items()},
        EsrganParams(scale=4, n_blocks=2),
        dev,
    )

    rng = np.random.default_rng(3)
    img = Image(rng.integers(0, 255, (48, 64, 4), np.uint8), ImageFormat.rgba_u8)
    with SamServer(sam, batch_size=2, max_delay_ms=500) as ss, EsrganServer(
        esr, batch_size=2, max_delay_ms=500
    ) as es:
        f1 = ss.submit(img, point=(20, 20))
        f2 = es.submit(img)
        f3 = es.submit(img)
        mask = f1.result(timeout=600)
        up1, up2 = f2.result(timeout=600), f3.result(timeout=600)
    assert mask.extent == img.extent and mask.format == ImageFormat.alpha_u8
    assert up1.extent == (64 * 4, 48 * 4) and up1.format == ImageFormat.rgba_u8
    assert np.array_equal(np.asarray(up1.data), np.asarray(up2.data))
    assert es.stats.batches == 1  # the two esrgan requests shared one program
    assert es.stats.p50_latency_ms > 0.0


@pytest.mark.slow
@pytest.mark.heavy
def test_sam_server_end_to_end():
    """Point + box requests batched through one program match the
    single-request SamModel path."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.serve import SamServer

    dev = backend_init()
    params = {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}
    model = SamModel(params, SamParams(), dev)

    rng = np.random.default_rng(7)
    img_a = Image(rng.integers(0, 255, (96, 128, 4), np.uint8), ImageFormat.rgba_u8)
    img_b = Image(rng.integers(0, 255, (96, 128, 4), np.uint8), ImageFormat.rgba_u8)

    # generous batch window: request prep (1024^2 resize) runs on the prep
    # pool after submit, so the window must cover the prep time for grouping
    # even on a loaded CI machine
    with SamServer(model, batch_size=2, max_delay_ms=10_000) as srv:
        f1 = srv.submit(img_a, point=(40, 30))
        f2 = srv.submit(img_b, point=(80, 60))
        f3 = srv.submit(img_a, box=((10, 10), (100, 80)))
        m1, m2, m3 = (f.result(timeout=600) for f in (f1, f2, f3))

    assert m1.extent == img_a.extent and m1.format == ImageFormat.alpha_u8
    assert m2.extent == img_b.extent
    assert m3.extent == img_a.extent
    # the two point requests shared one batched program
    assert srv.stats.batches == 2
    assert srv.stats.requests == 3

    # parity with the single-request path (reference vision.cpp:54-95)
    model.encode(img_a)
    direct = model.compute(point=(40, 30))
    assert np.array_equal(np.asarray(direct.data), np.asarray(m1.data))


@pytest.mark.slow
@pytest.mark.heavy
def test_image_server_three_families():
    """ImageServer batches birefnet/depthany/migan requests into shared
    programs with single-request parity (reference runs these families one
    request at a time, vision.cpp:97-205)."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.birefnet import BirefnetModel, BirefnetParams
    from vision_tpu.models.depth_anything import DepthAnythingModel, DepthAnythingParams
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import (
        random_birefnet_params,
        random_depth_anything_params,
        random_migan_params,
    )
    from vision_tpu.models.swin import SWIN_T_PARAMS
    from vision_tpu.serve import ImageServer

    dev = backend_init()
    rng = np.random.default_rng(11)

    def u8_img(h, w):
        return Image(rng.integers(0, 255, (h, w, 4), np.uint8), ImageFormat.rgba_u8)

    # --- depth-anything (dynamic snapped extents bucket separately) ---
    # reduced "test" config + image_size=126: this test is about BATCHING
    # (bucketing, grouping, parity), which is model-size-invariant — the
    # production "small" config at the 518 snap target costs ~5 min of
    # XLA-CPU compile+execute here for zero extra coverage (full extents
    # stay covered by test_depth_anything.py::test_depthany_predict_full)
    from vision_tpu.models.dino import DinoParams

    da = DepthAnythingModel(
        random_depth_anything_params("test"),
        DepthAnythingParams(
            dino=DinoParams(embed_dim=64, n_heads=2, n_layers=4),
            image_size=126,
            feature_layers=(0, 1, 2, 3),
        ),
        dev,
    )
    img_a, img_b, img_c = u8_img(126, 140), u8_img(126, 140), u8_img(98, 98)
    with ImageServer(da, batch_size=2, max_delay_ms=10_000) as srv:
        fa, fb, fc = srv.submit(img_a), srv.submit(img_b), srv.submit(img_c)
        da_a, da_b, da_c = (f.result(timeout=600) for f in (fa, fb, fc))
    assert srv.stats.requests == 3 and srv.stats.batches == 2  # c bucketed apart
    assert da_a.extent == img_a.extent and da_c.extent == img_c.extent
    direct = da.compute(img_a)
    np.testing.assert_allclose(np.asarray(da_a.data), np.asarray(direct.data), atol=1e-5)

    # oversized uploads are rejected at submit (depthany snaps its extent
    # UP from the input — unguarded, one huge request would jit a one-off
    # giant program; review r4c)
    with ImageServer(da, batch_size=2, max_delay_ms=5, max_pixels=256 * 256) as srv:
        fut = srv.submit(u8_img(300, 300))
        with pytest.raises(ValueError, match="max_pixels"):
            fut.result(timeout=600)

    # --- birefnet (fixed 256 extent) ---
    bn = BirefnetModel(
        random_birefnet_params("tiny"),
        BirefnetParams(image_size=256, image_extent=(256, 256), encoder=SWIN_T_PARAMS),
        dev,
    )
    img_d, img_e = u8_img(256, 256), u8_img(256, 256)
    with ImageServer(bn, batch_size=2, max_delay_ms=10_000) as srv:
        fd, fe = srv.submit(img_d), srv.submit(img_e)
        bn_d, bn_e = fd.result(timeout=600), fe.result(timeout=600)
    assert srv.stats.batches == 1  # one shared program
    assert bn_d.format == ImageFormat.alpha_u8 and bn_d.extent == img_d.extent
    np.testing.assert_array_equal(np.asarray(bn_d.data), np.asarray(bn.compute(img_d).data))

    # --- migan (image, mask) requests (64-res ladder: batching semantics
    # are resolution-invariant; 256/512 stay covered by test_migan) ---
    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    mask = Image(
        (rng.random((64, 64, 1)) > 0.5).astype(np.uint8) * 255, ImageFormat.alpha_u8
    )
    img_f, img_g = u8_img(64, 64), u8_img(64, 64)
    with ImageServer(mg, batch_size=2, max_delay_ms=10_000) as srv:
        ff, fg = srv.submit((img_f, mask)), srv.submit((img_g, mask))
        mg_f, mg_g = ff.result(timeout=600), fg.result(timeout=600)
    assert srv.stats.batches == 1
    assert mg_f.format == ImageFormat.rgba_u8 and mg_f.extent == img_f.extent
    np.testing.assert_array_equal(
        np.asarray(mg_f.data), np.asarray(mg.compute(img_f, mask).data)
    )


@pytest.mark.slow
def test_yolo_server():
    """YoloServer batches detection requests into one program with
    single-request parity; per-request thresholds ride along."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.random_weights import random_yolov9t_params
    from vision_tpu.models.yolov9t import Yolov9tModel, Yolov9tParams
    from vision_tpu.serve import YoloServer

    dev = backend_init()
    model = Yolov9tModel(random_yolov9t_params(), Yolov9tParams(), dev)

    rng = np.random.default_rng(5)
    img_a = Image(rng.integers(0, 255, (120, 160, 3), np.uint8), ImageFormat.rgb_u8)
    img_b = Image(rng.integers(0, 255, (90, 100, 3), np.uint8), ImageFormat.rgb_u8)

    # max_candidates=all anchors: exact parity with the unbatched predict
    # path (random weights put every anchor at ~0.5 score, so ANY top-k
    # truncation would pick a different tie subset; real weights have
    # distinct scores and use the production default)
    with YoloServer(
        model, batch_size=2, max_delay_ms=10_000, conf_thres=0.01, max_candidates=8400
    ) as srv:
        fa = srv.submit(img_a)
        fb = srv.submit(img_b, conf_thres=0.99)  # different sizes still batch:
        da, db = fa.result(timeout=600), fb.result(timeout=600)
    assert srv.stats.batches == 1  # letterbox gives one shared bucket
    direct = model.compute(img_a, conf_thres=0.01)
    assert [(d.class_id, round(d.confidence, 5)) for d in da] == [
        (d.class_id, round(d.confidence, 5)) for d in direct
    ]
    assert len(db) <= len(model.compute(img_b, conf_thres=0.01))


@pytest.mark.slow
def test_server_warmup_compiles_before_traffic():
    """warmup() compiles the batched program so the first real request
    reuses it (batch counter moves; no new trace needed)."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params
    from vision_tpu.serve import ImageServer

    dev = backend_init()
    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    rng = np.random.default_rng(13)
    with ImageServer(mg, batch_size=2, max_delay_ms=5) as srv:
        srv.warmup()
        # warmup compiled the program AND reset the stats so its compile
        # latency / padding-only batch don't poison the percentiles
        assert srv.stats.batches == 0 and srv.stats.requests == 0
        assert srv.stats.p50_latency_ms == 0.0
        img = Image(rng.integers(0, 255, (64, 64, 4), np.uint8), ImageFormat.rgba_u8)
        mask = Image(np.full((64, 64, 1), 255, np.uint8), ImageFormat.alpha_u8)
        out = srv.compute((img, mask))
        assert out.extent == img.extent
        assert srv.stats.batches == 1


def test_warmup_hang_times_out_cleanly(monkeypatch):
    """A warmup whose compile hangs (degraded tunnel, NOTES r4f: ~25 min
    silent) must surface as a clean TimeoutError after VISP_WARMUP_TIMEOUT,
    with the server still usable — not stall the caller forever."""
    from concurrent.futures import Future

    from vision_tpu.serve import _warmup_wait

    monkeypatch.setenv("VISP_WARMUP_TIMEOUT", "0.3")
    hung = Future()  # never resolves = compute hung in the batch worker
    with pytest.raises(TimeoutError, match="warmup\\(migan\\).*retry"):
        _warmup_wait([hung], "migan")


def test_warmup_wait_narrates_long_compiles(monkeypatch, capsys):
    """The minute-by-minute stderr narration fires while a compile is in
    flight (same discipline as the bench probe watchdog)."""
    import vision_tpu.serve as serve_mod
    from concurrent.futures import Future

    t = [0.0]
    monkeypatch.setattr(serve_mod.time, "monotonic", lambda: t[0])
    fut = Future()
    orig_result = fut.result

    def fake_result(timeout=None):
        # each poll "takes" its full chunk; resolve on the third poll
        t[0] += timeout
        if t[0] >= 150.0:
            fut.set_result("ok")
        return orig_result(timeout=0.1)

    monkeypatch.setattr(fut, "result", fake_result)
    monkeypatch.setenv("VISP_WARMUP_TIMEOUT", "900")
    serve_mod._warmup_wait([fut], "esrgan (256, 256)")
    err = capsys.readouterr().err
    assert err.count("still compiling") == 2  # at 60s and 120s


def test_image_server_migan_prep_does_not_premultiply_mask():
    """An off-resolution RGBA request (alpha = inpaint mask) must keep its
    RGB content through the resize: the stb path alpha-premultiplies, which
    used to black out the whole keep region (alpha 0 there) before the
    model ever saw it."""
    from vision_tpu.core.device import backend_init
    from vision_tpu.image import Image, ImageFormat
    from vision_tpu.models.migan import MiganModel, MiganParams
    from vision_tpu.models.random_weights import random_migan_params
    from vision_tpu.serve import ImageServer

    dev = backend_init()
    mg = MiganModel(random_migan_params(64), MiganParams(resolution=64), dev)
    srv = ImageServer(mg, batch_size=1, max_delay_ms=1)
    try:
        rgba = np.full((32, 32, 4), 200, np.uint8)
        rgba[:, :, 3] = 0  # keep everything; small fill hole
        rgba[12:20, 12:20, 3] = 255
        img = Image(rgba, ImageFormat.rgba_u8)
        mask = Image(np.ascontiguousarray(rgba[:, :, 3:4]), ImageFormat.alpha_u8)
        x, m, res, _ = srv._prepare((img, mask))
        assert res == (64, 64) and x.shape == (64, 64, 3)
        # keep-region conditioning stays bright (was 0 with the premultiply bug)
        assert float(x[:8, :8].mean()) > 150.0, float(x[:8, :8].mean())
    finally:
        srv.close()


def test_sam_server_default_batch_is_s2b_optimum():
    """SamServer's default batch resolves to 6 per chip — the measured
    space-to-batch optimum (NOTES round-4d: 289.8 img/s at b6; batch >= 8
    leaves XLA's deep-batch conv regime). On a dp mesh the default scales
    to 6*dp so each chip keeps its optimal shard."""
    from vision_tpu.core.device import BackendType, backend_init
    from vision_tpu.models.mobile_sam import SamModel, SamParams
    from vision_tpu.models.random_weights import random_mobile_sam_params
    from vision_tpu.parallel import make_mesh
    from vision_tpu.serve import SamServer

    dev = backend_init(BackendType.cpu)
    params = {k: np.asarray(v) for k, v in random_mobile_sam_params(0).items()}
    with SamServer(SamModel(params, SamParams(), dev)) as srv:
        assert srv.batch_size == 6
    mesh = make_mesh(2)
    with SamServer(SamModel(params, SamParams(), dev, mesh=mesh)) as srv:
        assert srv.batch_size == 12
    with pytest.raises(ValueError):
        SamServer(SamModel(params, SamParams(), dev, mesh=mesh), batch_size=3)


def test_resolve_batch_defaults_scale_with_dp():
    """Every server resolves batch_size=None to its family's per-chip
    default scaled by the mesh's dp extent (so `vision-cli serve --dp N`
    needs no --batch and each chip keeps its optimal shard); explicit
    values validate against the dp axis."""
    from vision_tpu.parallel import make_mesh
    from vision_tpu.serve import _resolve_batch

    assert _resolve_batch(None, 6, None) == 6
    assert _resolve_batch(4, 6, None) == 4
    mesh = make_mesh(4)
    assert _resolve_batch(None, 6, mesh) == 24
    assert _resolve_batch(None, 8, mesh) == 32
    assert _resolve_batch(8, 6, mesh) == 8
    with pytest.raises(ValueError):
        _resolve_batch(6, 6, mesh)  # not divisible by dp=4
    with pytest.raises(ValueError):
        _resolve_batch(0, 6, None)
