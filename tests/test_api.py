"""HTTP API tests: health/models endpoints and super-resolve round trip."""

import http.client
import threading

import numpy as np
import cv2
import json
import pytest

from facesr.models import face_enhance_net as fen
from facesr.ckpt import save_model


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    ckpt_dir = tmp_path_factory.mktemp("api_ckpt")
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from app.api import serve

    srv = serve(str(ckpt_dir), port=0, host="127.0.0.1")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield port
    srv.shutdown()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_health_and_models(server):
    status, ctype, data = _request(server, "GET", "/health")
    assert status == 200 and "json" in ctype
    payload = json.loads(data)
    assert payload["status"] == "ok" and payload["models"]

    status, _, data = _request(server, "GET", "/models")
    info = json.loads(data)
    assert next(iter(info.values()))["scale_factor"] == 4


def test_super_resolve_roundtrip(server):
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    status, ctype, data = _request(server, "POST", "/super-resolve", body=png.tobytes())
    assert status == 200 and ctype == "image/png"
    out = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert out.shape == (256, 256, 3)  # 64 -> 256 4x SR


def test_error_paths(server):
    status, _, data = _request(server, "POST", "/super-resolve", body=b"not an image")
    assert status == 400 and b"decode" in data

    status, _, _ = _request(server, "POST", "/super-resolve")
    assert status == 400

    status, _, data = _request(server, "POST", "/super-resolve?model=nope",
                               body=b"x" * 10)
    assert status == 400

    status, _, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_keepalive_survives_undrained_error_responses(server):
    """Error responses that never read the request body (404 wrong path,
    400 missing length) must not leave those bytes on a keep-alive
    connection — the server closes it instead of parsing the leftover
    image bytes as the next request line."""
    rng = np.random.default_rng(4)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    body = png.tobytes()

    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=60)
    try:
        conn.request("POST", "/superresolve", body=body)  # typo'd path
        resp = conn.getresponse()
        assert resp.status == 404
        assert resp.getheader("Connection") == "close"
        resp.read()
        # a correct follow-up on a FRESH connection round-trips fine
        # (http.client reopens automatically after a closed response)
        conn.request("POST", "/super-resolve", body=body)
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200
        out = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        assert out.shape == (256, 256, 3)
    finally:
        conn.close()

    # the happy path still keeps the connection alive: two POSTs through
    # ONE connection, no Connection: close
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=60)
    try:
        for _ in range(2):
            conn.request("POST", "/super-resolve", body=body)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("Connection") != "close"
            resp.read()
    finally:
        conn.close()


def test_api_int8_full_calibrated_serving(tmp_path):
    # --dtype int8_full --calib-dir calibrates static activation scales from
    # images on disk, then serves through the s8 conv path.
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(calib_dir / f"c{i}.png"), img)

    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from app.api import serve

    srv = serve(str(ckpt_dir), port=0, host="127.0.0.1", dtype="int8_full",
                calib_dir=str(calib_dir))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        status, ctype, data = _request(port, "POST", "/super-resolve",
                                       body=png.tobytes())
        assert status == 200 and ctype == "image/png"
        sr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        assert sr.shape == (256, 256, 3)
    finally:
        srv.shutdown()


def test_api_int8_serving(tmp_path):
    # --dtype int8 routes through the weight-quantized ShardedPredictor.
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from app.api import serve

    srv = serve(str(ckpt_dir), port=0, host="127.0.0.1", dtype="int8")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        status, ctype, data = _request(port, "POST", "/super-resolve",
                                       body=png.tobytes())
        assert status == 200 and ctype == "image/png"
        sr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        assert sr.shape == (256, 256, 3)
    finally:
        srv.shutdown()


def test_microbatcher_batches_and_matches_serial():
    """MicroBatcher: concurrent submissions coalesce into fewer forwards,
    per-image results are bit-identical to serial calls, mixed shapes are
    cohorted, and errors propagate to the callers that caused them."""
    import time
    from facesr.parallel.serving import MicroBatcher

    def fn(batch):
        if batch.shape[1] == 13:
            raise ValueError("bad shape")
        return batch * 2.0 + 1.0

    mb = MicroBatcher(fn, max_batch=8, window_ms=50.0)
    try:
        rng = np.random.default_rng(0)
        imgs = [rng.random((4, 4, 3)).astype(np.float32) for _ in range(8)]
        results = [None] * 8
        threads = [threading.Thread(target=lambda i=i: results.__setitem__(
            i, mb(imgs[i]))) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(8):
            np.testing.assert_array_equal(results[i], imgs[i] * 2.0 + 1.0)
        assert mb.images == 8
        assert mb.calls < 8  # actually batched (50ms window, concurrent)

        # mixed shapes dispatch as separate same-shape cohorts
        a = rng.random((4, 4, 3)).astype(np.float32)
        b = rng.random((6, 6, 3)).astype(np.float32)
        out = [None, None]
        ts = [threading.Thread(target=lambda: out.__setitem__(0, mb(a))),
              threading.Thread(target=lambda: out.__setitem__(1, mb(b)))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        np.testing.assert_array_equal(out[0], a * 2.0 + 1.0)
        np.testing.assert_array_equal(out[1], b * 2.0 + 1.0)

        with pytest.raises(ValueError, match="bad shape"):
            mb(rng.random((13, 13, 3)).astype(np.float32))
        # the batcher survives an erroring cohort
        np.testing.assert_array_equal(mb(a), a * 2.0 + 1.0)
    finally:
        mb.close()


def test_microbatcher_poisoned_request_spares_cohort():
    """One poisoned request must not fail innocent co-batched callers:
    the failed cohort is retried per-image, so only the offender errors
    (ADVICE r2)."""
    from facesr.parallel.serving import MicroBatcher

    def fn(batch):
        if float(batch.max()) > 10.0:
            raise ValueError("poisoned")
        return batch + 1.0

    mb = MicroBatcher(fn, max_batch=8, window_ms=200.0)
    try:
        rng = np.random.default_rng(1)
        good = [rng.random((4, 4, 3)).astype(np.float32) for _ in range(3)]
        bad = np.full((4, 4, 3), 99.0, np.float32)
        results = [None] * 4
        errors = [None] * 4

        def call(i, img):
            try:
                results[i] = mb(img)
            except Exception as e:
                errors[i] = e

        threads = [threading.Thread(target=call, args=(i, img))
                   for i, img in enumerate(good + [bad])]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(3):
            assert errors[i] is None, f"innocent caller {i} failed: {errors[i]}"
            np.testing.assert_array_equal(results[i], good[i] + 1.0)
        assert isinstance(errors[3], ValueError)
        # counters stayed consistent across the retry path (cohort
        # composition is timing-dependent; only images is deterministic)
        assert mb.images == 3 and 1 <= mb.calls <= 3
    finally:
        mb.close()


def test_api_microbatched_serving_matches_unbatched(tmp_path):
    # --batch-window-ms: concurrent requests coalesce into one device batch
    # and every client gets the same PNG the unbatched server produces.
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from app.api import serve

    srv_plain = serve(str(ckpt_dir), port=0, host="127.0.0.1")
    srv_mb = serve(str(ckpt_dir), port=0, host="127.0.0.1",
                   batch_window_ms=100.0, max_batch=8)
    ports = (srv_plain.server_address[1], srv_mb.server_address[1])
    for srv in (srv_plain, srv_mb):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(0)
        pngs = []
        for i in range(4):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            ok, png = cv2.imencode(".png", img)
            pngs.append(png.tobytes())

        serial = [_request(ports[0], "POST", "/super-resolve", body=p)[2]
                  for p in pngs]

        batched = [None] * 4
        def hit(i):
            batched[i] = _request(ports[1], "POST", "/super-resolve",
                                  body=pngs[i])[2]
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        for i in range(4):
            assert batched[i] == serial[i]  # byte-identical PNGs

        status, _, data = _request(ports[1], "GET", "/health")
        stats = json.loads(data)["batching"]
        b = next(iter(stats.values()))
        assert b["images"] == 4 and b["calls"] >= 1
    finally:
        srv_plain.shutdown()
        srv_mb.shutdown()


def test_api_exported_artifact_serving(tmp_path):
    """The deployment loop closed: export once (AOT StableHLO artifact,
    weights + precision baked in), then serve the HTTP API from the
    artifact ALONE — no checkpoints on the serving host. Output must
    match the checkpoint-served forward (f32 export is ~bit-exact)."""
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1,
                                   blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from facesr.ckpt.export import export_serving
    art = tmp_path / "face_sr_f32.jaxexp"
    art.write_bytes(export_serving(model, dtype=None, input_size=64,
                                   platforms=("cpu",)))

    from app.api import serve

    # artifact-only service: checkpoint dir does not exist on this "host"
    srv_art = serve(str(tmp_path / "nonexistent"), port=0, host="127.0.0.1",
                    exported=str(art))
    srv_ckpt = serve(str(ckpt_dir), port=0, host="127.0.0.1")
    for srv in (srv_art, srv_ckpt):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        p_art = srv_art.server_address[1]
        p_ckpt = srv_ckpt.server_address[1]

        status, _, data = _request(p_art, "GET", "/health")
        assert status == 200
        assert json.loads(data)["models"] == ["face_sr_f32"]
        status, _, data = _request(p_art, "GET", "/models")
        info = json.loads(data)["face_sr_f32"]
        assert info["model_class"] == "ExportedArtifact"

        rng = np.random.default_rng(3)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        s1, ct1, d1 = _request(p_art, "POST", "/super-resolve",
                               body=png.tobytes())
        s2, _, d2 = _request(p_ckpt, "POST", "/super-resolve",
                             body=png.tobytes())
        assert s1 == 200 and ct1 == "image/png" and s2 == 200
        a = cv2.imdecode(np.frombuffer(d1, np.uint8), cv2.IMREAD_COLOR)
        b = cv2.imdecode(np.frombuffer(d2, np.uint8), cv2.IMREAD_COLOR)
        assert a.shape == (256, 256, 3)
        # f32 artifact: identical up to the u8 rounding of a <=1e-5 drift
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    finally:
        srv_art.shutdown()
        srv_ckpt.shutdown()


def test_api_microbatched_predictor_path_matches_unbatched(tmp_path):
    # The dtype (ShardedPredictor) micro-batch path: cohorts pad to the
    # pow2 remainder ladder instead of the full compiled batch, and every
    # client still gets the byte-identical PNG of the unbatched server.
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    cfg = fen.FaceEnhanceNetConfig(num_channels=16, num_groups=1, blocks_per_group=2)
    model = fen.FaceEnhanceNet(cfg)
    save_model(str(ckpt_dir / "best_model.fckpt"), model.params, cfg, "custom")

    from app.api import SRService, serve

    # the service wires the pow2 ladder into its predictors
    svc = SRService(str(ckpt_dir), dtype="int8",
                    batch_window_ms=100.0, max_batch=16)
    pred = next(iter(svc.predictors.values()))
    assert pred.remainder_sizes, "micro-batched predictors need the ladder"
    assert all(s < pred.max_batch for s in pred.remainder_sizes)
    # without micro-batching the one-program guarantee stays intact
    svc_plain = SRService(str(ckpt_dir), dtype="int8")
    assert next(iter(svc_plain.predictors.values())).remainder_sizes == ()

    srv_plain = serve(str(ckpt_dir), port=0, host="127.0.0.1", dtype="int8")
    srv_mb = serve(str(ckpt_dir), port=0, host="127.0.0.1", dtype="int8",
                   batch_window_ms=100.0, max_batch=16)

    ports = (srv_plain.server_address[1], srv_mb.server_address[1])
    for srv in (srv_plain, srv_mb):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(3)
        pngs = []
        for i in range(3):  # odd count -> a sub-max cohort somewhere
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            ok, png = cv2.imencode(".png", img)
            pngs.append(png.tobytes())

        serial = [_request(ports[0], "POST", "/super-resolve", body=p)[2]
                  for p in pngs]

        batched = [None] * 3

        def hit(i):
            batched[i] = _request(ports[1], "POST", "/super-resolve",
                                  body=pngs[i])[2]

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        for i in range(3):
            assert batched[i] == serial[i]  # byte-identical PNGs
    finally:
        srv_plain.shutdown()
        srv_mb.shutdown()


def test_compile_cache_populates(tmp_path):
    # --compile-cache: the persistent XLA cache fills with serving
    # programs so restarts skip recompilation (AOT artifacts remain the
    # zero-compile path; this covers checkpoint serving).
    from facesr.utils.compile_cache import enable_compile_cache

    import jax
    import jax.numpy as jnp

    prev = (jax.config.jax_compilation_cache_dir,
            jax.config.jax_persistent_cache_min_compile_time_secs,
            jax.config.jax_persistent_cache_min_entry_size_bytes)
    try:
        cache = enable_compile_cache(str(tmp_path / "jit_cache"))
        assert jax.config.jax_compilation_cache_dir == cache
        jax.jit(lambda x: (x * 2 + 1).sum())(
            jnp.arange(1024.0)).block_until_ready()
        import os

        assert os.listdir(cache), "cache directory stayed empty"
        # calling again with the same path is idempotent
        assert enable_compile_cache(cache) == cache
    finally:  # global config — restore so the rest of the suite is unaffected
        jax.config.update("jax_compilation_cache_dir", prev[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev[1])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev[2])
