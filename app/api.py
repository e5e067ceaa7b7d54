#!/usr/bin/env python
"""HTTP serving API for face super-resolution.

The reference's docker-compose declares an `app/api.py` service that does
not exist in its repo (reference docker-compose.yml:43-73, noted
aspirational in SURVEY.md §2.7); this is a real one. Standard-library
`http.server` + threads — no web-framework dependency — so the serving
surface works in any environment where the framework runs.

Endpoints:
  GET  /health            -> {"status": "ok", "models": [...], "device": ...}
  GET  /models            -> model names + configs
  POST /super-resolve     -> body: PNG/JPEG image bytes.
                             Query: ?model=<name> (default: first loaded)
                             Response: PNG bytes of the SR image.
                             An already-LR input (<=128px) is upscaled 4x;
                             larger inputs are center-cropped to 256 and a
                             64px LR is synthesized (same heuristic as the
                             demo / reference app/demo.py:244-266).

Usage:
  python app/api.py --checkpoint-dir checkpoints --port 8000
  curl -X POST --data-binary @face.png localhost:8000/super-resolve > sr.png
"""

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import urlparse, parse_qs

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np
import cv2


class SRService:
    """Loads models once; thread-safe inference (jitted fns are reentrant)."""

    def __init__(self, checkpoint_dir: str, dtype: str | None = None,
                 calib_dir: str | None = None, quant_cache: str | None = None,
                 batch_window_ms: float = 0.0, max_batch: int = 0,
                 exported: str | None = None):
        """dtype: None/'f32' direct forwards; 'bf16'/'int8'/'int8_full'
        route through ShardedPredictor ('int8' = weight-only quantization,
        'int8_full' also quantizes activations onto the MXU's s8 pipe —
        see facesr.ops.quant and BENCH.md for the quality/speed trade).
        calib_dir: directory of representative LR images; with
        dtype='int8_full' the predictors calibrate static activation scales
        on them (faster hot path than the default dynamic per-image scales).
        batch_window_ms > 0 coalesces concurrent requests into one device
        batch (facesr.parallel.serving.MicroBatcher) of up to `max_batch`
        images (0 = a device-count multiple default).
        exported: comma-separated AOT artifact paths (scripts/
        export_serving.py) served under their filename stems — the full
        deployment loop: weights + precision are baked into the artifact,
        so no checkpoints (or model code) are needed; `dtype` does not
        apply to them. With only `exported`, checkpoint_dir may be empty."""
        from pathlib import Path

        self.exported = {}
        if exported:
            from facesr.ckpt.export import load_exported_many

            # loud load-time validation: spatial size must match the LR
            # this server feeds; micro-batching needs a symbolic batch dim
            self.exported = load_exported_many(
                exported, spatial=64,
                require_symbolic_batch=batch_window_ms > 0)

        self.models = {}
        if not self.exported or Path(checkpoint_dir).exists():
            from app.demo import load_models_from_checkpoints

            self.models = load_models_from_checkpoints(checkpoint_dir)
        if not self.models and not self.exported:
            raise RuntimeError(f"No checkpoints found in {checkpoint_dir}")
        dup = set(self.models) & set(self.exported)
        if dup:
            raise ValueError(f"exported artifact name(s) {sorted(dup)} "
                             f"collide with checkpoint model names — "
                             f"rename the artifact")
        self.default = next(iter({**self.models, **self.exported}))
        self.predictors = {}
        self.batchers = {}
        import jax

        n = len(jax.devices())
        # the device batch the micro-batcher aims for; predictors must be
        # compiled at least this large or coalesced cohorts would be chunked
        # back into device-count-sized forwards
        mb = (max_batch or 4 * n) if batch_window_ms > 0 else 0
        if dtype and dtype != "f32":
            from app.demo import wrap_predictors

            # Under micro-batching, cohorts arrive at every size up to mb;
            # without remainder sizes the predictor pads each one to its
            # full compiled batch, so a lone request pays an mb-sized
            # forward (the same low-concurrency regression ADVICE r2
            # flagged on the raw-model path, where it's solved by pow2
            # padding). Give the predictors the matching pow2 ladder —
            # bounded compiles (log2), lone requests pay ~device-count.
            pmb = max(n, max_batch or 0, mb)
            rs, s = [], n
            while mb and s < pmb:
                rs.append(s)
                s *= 2
            self.predictors = wrap_predictors(
                self.models, dtype=dtype, calib_dir=calib_dir,
                quant_cache=quant_cache, max_batch=pmb,
                remainder_sizes=tuple(rs))
        if batch_window_ms > 0:
            import jax.numpy as jnp
            from facesr.parallel.serving import MicroBatcher

            def raw_batched(m_):
                # pad each cohort to the next power of two (capped at mb):
                # the raw model jit retraces per input shape, so padding
                # bounds compiles at log2(mb)+1 sizes instead of one per
                # distinct arrival count — while a lone request still pays
                # only a batch-1 forward rather than an mb-sized one
                # (ADVICE r2: full-mb padding made low-concurrency
                # micro-batching strictly worse than unbatched serving)
                def fn(b):
                    k = b.shape[0]
                    target = 1
                    while target < k:
                        target *= 2
                    # never dispatch beyond the configured max batch: for a
                    # non-power-of-two mb the top compile size is mb itself
                    # (sizes {1, 2, ..., next_pow2(mb)/2, mb}), not
                    # next_pow2(mb) — which would exceed the operator's
                    # device-memory budget
                    target = min(target, mb)
                    if k < target:
                        b = np.concatenate(
                            [b, np.repeat(b[-1:], target - k, axis=0)], axis=0)
                    return np.clip(np.asarray(m_(jnp.asarray(b))), 0, 1)[:k]
                return fn

            # exported artifacts batch through the same pow2-padding
            # wrapper: their batch dim is symbolic, so each padded size
            # compiles once, exactly like the raw-model jit
            servables = {**self.models, **self.exported}
            self.batchers = {
                name: MicroBatcher(
                    (self.predictors[name] if name in self.predictors
                     else raw_batched(m)),
                    max_batch=mb, window_ms=batch_window_ms)
                for name, m in servables.items()
            }

    def model_info(self):
        from dataclasses import asdict, is_dataclass

        out = {}
        for name, m in self.models.items():
            cfg = m.config
            info = asdict(cfg) if is_dataclass(cfg) else dict(vars(cfg))
            info["model_class"] = type(m).__name__
            out[name] = info
        for name, fn in self.exported.items():
            ex = getattr(fn, "exported", None)
            out[name] = {
                "model_class": "ExportedArtifact",
                "input_shape": (str(ex.in_avals[0].shape)
                                if ex is not None and ex.in_avals else None),
                "platforms": (list(ex.platforms)
                              if ex is not None and
                              getattr(ex, "platforms", None) else None),
            }
        return out

    def super_resolve(self, image_bytes: bytes, model_name: str | None = None) -> bytes:
        from app.demo import prepare_inputs
        import jax.numpy as jnp

        name = model_name or self.default
        if name not in self.models and name not in self.exported:
            raise KeyError(f"unknown model {name!r}; available: "
                           f"{list(self.models) + list(self.exported)}")
        buf = np.frombuffer(image_bytes, np.uint8)
        bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("could not decode image")
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        lr, _ = prepare_inputs(rgb)
        if name in self.batchers:
            sr = self.batchers[name](lr)
        elif name in self.predictors:
            sr = self.predictors[name](lr[None])[0]
        elif name in self.exported:
            sr = np.clip(self.exported[name](lr[None]), 0, 1)[0]
        else:
            sr = np.asarray(self.models[name](jnp.asarray(lr[None])))[0]
        sr_u8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
        ok, png = cv2.imencode(".png", cv2.cvtColor(sr_u8, cv2.COLOR_RGB2BGR))
        if not ok:
            raise RuntimeError("PNG encoding failed")
        return png.tobytes()


def make_handler(service: SRService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response already carries an exact
        # Content-Length, and without this the default HTTP/1.0 closes the
        # connection per request — a new TCP setup per image on a serving
        # path whose overhead is already host-bound (api_load_probe.py)
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj, close: bool = False) -> None:
            # close=True: the request body was never drained (wrong path /
            # missing length), so the next keep-alive request on this
            # connection would be parsed out of the leftover bytes —
            # close instead of desyncing.
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if close:
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                path = urlparse(self.path).path
                if path == "/health":
                    import jax

                    info = {
                        "status": "ok",
                        "models": (list(service.models)
                                   + list(service.exported)),
                        "device": jax.devices()[0].platform,
                    }
                    if service.batchers:
                        info["batching"] = {
                            name: {"calls": b.calls, "images": b.images}
                            for name, b in service.batchers.items()
                        }
                    self._json(200, info)
                elif path == "/models":
                    self._json(200, service.model_info())
                else:
                    self._json(404, {"error": f"unknown path {path}"})
            except Exception as e:  # always answer the request
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def do_POST(self):
            path = urlparse(self.path).path
            if path != "/super-resolve":
                self._json(404, {"error": f"unknown path {path}"}, close=True)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._json(400, {"error": "empty body; POST image bytes"},
                               close=True)
                    return
                body = self.rfile.read(length)
                q = parse_qs(urlparse(self.path).query)
                model = q.get("model", [None])[0]
                png = service.super_resolve(body, model)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
            except KeyError as e:
                self._json(400, {"error": str(e)})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(checkpoint_dir: str, port: int = 8000, host: str = "0.0.0.0",
          dtype: str | None = None, calib_dir: str | None = None,
          quant_cache: str | None = None, batch_window_ms: float = 0.0,
          max_batch: int = 0, exported: str | None = None):
    service = SRService(checkpoint_dir, dtype=dtype, calib_dir=calib_dir,
                        quant_cache=quant_cache,
                        batch_window_ms=batch_window_ms, max_batch=max_batch,
                        exported=exported)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"facesr API serving "
          f"{list(service.models) + list(service.exported)} on {host}:{port}")
    return server


def main():
    parser = argparse.ArgumentParser(description="Face SR HTTP API")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--dtype", type=str, default=None,
                        choices=["f32", "bf16", "int8", "int8_full"],
                        help="serving precision; int8 = weight-only "
                             "quantization (4x smaller weights, output "
                             "parity-gated); int8_full also quantizes "
                             "activations (fastest, larger quality delta "
                             "— see BENCH.md)")
    parser.add_argument("--calib-dir", type=str, default=None,
                        help="directory of representative LR images for "
                             "static activation-scale calibration "
                             "(int8_full only)")
    parser.add_argument("--quant-cache", type=str, default=None,
                        help="path prefix persisting calibrated int8 trees "
                             "(per model) so restarts skip calibration")
    parser.add_argument("--batch-window-ms", type=float, default=0.0,
                        help="coalesce concurrent requests arriving within "
                             "this window into ONE device batch (TPU "
                             "throughput is batch-bound — see BENCH.md); "
                             "0 = one forward per request")
    parser.add_argument("--max-batch", type=int, default=0,
                        help="micro-batch size cap (0 = 4x device count)")
    parser.add_argument("--exported", type=str, default=None,
                        help="comma-separated AOT artifacts "
                             "(scripts/export_serving.py) served under "
                             "their filename stems — weights + precision "
                             "baked in, no checkpoints needed")
    parser.add_argument("--compile-cache", type=str, default=None,
                        help="directory for JAX's persistent compilation "
                             "cache: server restarts (and repeat batch-"
                             "size rungs) reuse compiled XLA programs "
                             "instead of recompiling; complements "
                             "--exported, which skips compiles entirely")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from facesr.utils.compile_cache import enable_compile_cache

        print(f"compilation cache: {enable_compile_cache(args.compile_cache)}")

    server = serve(args.checkpoint_dir, args.port, args.host, dtype=args.dtype,
                   calib_dir=args.calib_dir, quant_cache=args.quant_cache,
                   batch_window_ms=args.batch_window_ms,
                   max_batch=args.max_batch, exported=args.exported)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nShutting down.")
        server.shutdown()


if __name__ == "__main__":
    main()
