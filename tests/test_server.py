"""HTTP inference server smoke test (tiny model, ephemeral port)."""
import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture(scope='module')
def server_url():
    from hcpdiff_tpu.config import containerize, resolve
    from hcpdiff_tpu.server import InferenceServer, make_handler
    cfg = resolve(containerize({
        'pretrained_model': 'tiny', 'dtype': 'fp32',
        'infer_args': {'width': 32, 'height': 32, 'inference_steps': 2,
                       'sampler': 'euler'},
        'interface': [],
    }))
    srv = InferenceServer(cfg)
    httpd = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(srv))
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    yield f'http://127.0.0.1:{httpd.server_address[1]}'
    httpd.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(url + path, json.dumps(obj).encode(),
                                 {'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_health(server_url):
    with urllib.request.urlopen(server_url + '/health', timeout=30) as r:
        out = json.loads(r.read())
    assert out['status'] == 'ok'


def test_txt2img_endpoint(server_url):
    out = _post(server_url, '/txt2img',
                {'prompt': 'a photo of cat', 'width': 32, 'height': 32,
                 'steps': 2, 'seed': 5, 'sampler': 'euler'})
    assert len(out['images']) == 1
    png = base64.b64decode(out['images'][0])
    assert png[:8] == b'\x89PNG\r\n\x1a\n'
    assert out['seed'] == 5
