"""Minimal production inference server (stdlib http.server).

The TPU-side counterpart of the reference's webui integration surface
(WebUIInterface + VisualizerReloadable): one resident model, jit-compiled
loops reused across requests, hot-reload of the merge recipe between
requests via VisualizerReloadable.check_reload.

    python -m hcpdiff_tpu.server --cfg cfgs/infer/text2img.yaml --port 7860

POST /txt2img   {"prompt": ..., "negative_prompt": ..., "width":..,
                 "height":.., "steps":.., "cfg_scale":.., "seed":..,
                 "sampler":.., "bs":..}
  -> {"images": [base64 png, ...], "seed": ...}
GET  /health    -> {"status": "ok", "backend": ...}
POST /reload    {full new config json} -> hot-reload changed parts
"""
from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict

import numpy as np


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return base64.b64encode(buf.getvalue()).decode()


class InferenceServer:
    def __init__(self, cfgs, reload_token: str | None = None):
        import os
        from .infer.reloadable import VisualizerReloadable
        self.viser = VisualizerReloadable(cfgs)
        self.lock = threading.Lock()  # one TPU, serialized generation
        self.reload_token = reload_token or os.environ.get('HCP_RELOAD_TOKEN')

    def txt2img(self, req: Dict[str, Any]) -> Dict[str, Any]:
        import time
        seed = req.get('seed')
        if seed is None:
            seed = int(time.time() * 1000) % (1 << 31)
        with self.lock:
            imgs = self.viser.vis_images(
                req.get('prompt', ''), req.get('negative_prompt', ''),
                width=int(req.get('width', 512)),
                height=int(req.get('height', 512)),
                inference_steps=int(req.get('steps', req.get('inference_steps', 20))),
                guidance_scale=float(req.get('cfg_scale',
                                             req.get('guidance_scale', 7.5))),
                sampler=str(req.get('sampler', 'dpm++_2m')),
                seed=int(seed))
        return {'images': [_png_b64(i) for i in np.asarray(imgs)],
                'seed': int(seed)}

    def reload(self, new_cfg: Dict[str, Any]) -> Dict[str, Any]:
        from .config import containerize, resolve
        with self.lock:
            full = self.viser.check_reload(resolve(containerize(new_cfg)))
        return {'reloaded': True, 'full_rebuild': bool(full)}


def make_handler(server: InferenceServer):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                import jax
                self._json(200, {'status': 'ok',
                                 'backend': jax.default_backend(),
                                 'devices': len(jax.devices())})
            else:
                self._json(404, {'error': 'unknown path'})

        def do_POST(self):
            try:
                n = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(n) or b'{}')
                if self.path == '/txt2img':
                    self._json(200, server.txt2img(req))
                elif self.path == '/reload':
                    # /reload accepts a full config (can repoint model/emb
                    # paths) — require the token whenever one is configured
                    tok = server.reload_token
                    if tok and self.headers.get('X-Auth-Token') != tok:
                        self._json(403, {'error': 'invalid or missing '
                                                  'X-Auth-Token'})
                        return
                    self._json(200, server.reload(req))
                else:
                    self._json(404, {'error': 'unknown path'})
            except Exception as e:  # pragma: no cover
                self._json(500, {'error': f'{type(e).__name__}: {e}'})

        def log_message(self, fmt, *args):
            pass

    return Handler


def serve(cfgs, host: str = '127.0.0.1', port: int = 7860,
          reload_token: str | None = None):
    srv = InferenceServer(cfgs, reload_token=reload_token)
    if host not in ('127.0.0.1', 'localhost', '::1') and not srv.reload_token:
        print('[hcpdiff-tpu] WARNING: non-loopback bind without a reload '
              'token — /reload is open; set --reload-token or '
              'HCP_RELOAD_TOKEN')
    httpd = ThreadingHTTPServer((host, port), make_handler(srv))
    print(f'[hcpdiff-tpu] serving on {host}:{port}')
    httpd.serve_forever()


def main():
    import argparse
    from .config import load
    p = argparse.ArgumentParser()
    p.add_argument('--cfg', required=True)
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=7860)
    p.add_argument('--reload-token', default=None,
                   help='token required in X-Auth-Token for POST /reload '
                        '(default: HCP_RELOAD_TOKEN env)')
    args, unknown = p.parse_known_args()
    serve(load(args.cfg, unknown), args.host, args.port,
          reload_token=args.reload_token)


if __name__ == '__main__':
    main()
