"""The serving daemon (tools/deployment/serve.py) — the reference's
TorchServe deployment analogue (docker/serve + mmdet_handler.py) — must
serve real HTTP: health check, TorchServe body formats (raw bytes +
base64 JSON), the reference handler's response schema, micro-batching of
concurrent requests, and clean errors for bad input.
"""
import base64
import importlib.util
import json
import os.path as osp
import threading
import urllib.request

import cv2
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _load_serve():
    spec = importlib.util.spec_from_file_location(
        'serve', osp.join(REPO, 'tools/deployment/serve.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_cfg():
    return dict(
        type='SingleStageDetector',
        backbone=dict(type='DarknetCSP', scale='v4s5p',
                      out_indices=[3, 4, 5]),
        neck=dict(type='YOLOV4Neck', in_channels=[128, 256, 256],
                  out_channels=[128, 256, 512], csp_repetition=1),
        bbox_head=dict(type='YOLOCSPHead', num_classes=8,
                       in_channels=[128, 256, 512]),
        test_cfg=dict(min_bbox_size=0, nms_pre=-1, score_thr=0.001,
                      anchor_pre=512, class_pre=64,
                      nms=dict(type='nms', iou_threshold=0.65),
                      max_per_img=20))


def _jpeg_bytes(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode('.jpg', img)
    assert ok
    return buf.tobytes()


@pytest.fixture(scope='module')
def http_server():
    serve = _load_serve()
    server = serve.ModelServer(_tiny_cfg(), checkpoint=None, batch=2,
                               img_size=64, score_thr=0.0,
                               max_batch_delay_ms=30.0)
    httpd = serve.ThreadingHTTPServer(
        ('127.0.0.1', 0), serve.make_handler(server, 'yolo'))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f'http://127.0.0.1:{httpd.server_address[1]}', server
    httpd.shutdown()
    server.close()


def _post(url, body, ctype='application/octet-stream'):
    req = urllib.request.Request(url, data=body,
                                 headers={'Content-Type': ctype})
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_ping(http_server):
    url, _ = http_server
    with urllib.request.urlopen(url + '/ping', timeout=10) as r:
        assert json.loads(r.read()) == {'status': 'Healthy'}


def test_predict_raw_bytes_reference_schema(http_server):
    url, server = http_server
    status, result = _post(url + '/predictions/yolo', _jpeg_bytes())
    assert status == 200
    assert isinstance(result, list)
    # reference handler schema (mmdet_handler.py:57-67): each det is
    # {<class_name>: [x1, y1, x2, y2], 'score': s}
    classes = set(server.detector.CLASSES)
    for det in result:
        assert set(det) - {'score'} and 0.0 <= det['score'] <= 1.0
        (name,) = set(det) - {'score'}
        assert name in classes
        assert len(det[name]) == 4


def test_predict_base64_json_body(http_server):
    url, _ = http_server
    body = json.dumps(
        {'data': base64.b64encode(_jpeg_bytes(seed=1)).decode()}).encode()
    status, result = _post(url + '/predictions/yolo', body,
                           ctype='application/json')
    assert status == 200 and isinstance(result, list)


def test_concurrent_requests_batch_together(http_server):
    url, _ = http_server
    results = [None] * 4

    def call(i):
        results[i] = _post(url + '/predictions/yolo',
                           _jpeg_bytes(seed=10 + i))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(st == 200 and isinstance(r, list) for st, r in results)


def test_bad_image_and_unknown_model(http_server):
    url, _ = http_server
    status, err = _post(url + '/predictions/yolo', b'not an image')
    assert status == 400 and 'error' in err
    status, err = _post(url + '/predictions/nope', _jpeg_bytes())
    assert status == 404 and 'error' in err


def test_scale_factor_rescales_to_original_frame(http_server):
    _, server = http_server
    # boxes must come back in the ORIGINAL image frame: a 128-wide image
    # letterboxed to 64 means detections cannot exceed the original dims
    result = server.submit(_jpeg_bytes(h=96, w=128, seed=3))
    for det in result:
        (name,) = set(det) - {'score'}
        x1, y1, x2, y2 = det[name]
        assert 0 <= x1 <= x2 <= 128 + 1e-3
        assert 0 <= y1 <= y2 <= 96 + 1e-3
