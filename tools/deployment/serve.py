#!/usr/bin/env python
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))
"""TPU-native model server — the reference's TorchServe deployment
(docker/serve, tools/deployment/mmdet2torchserve.py + mmdet_handler.py)
rebuilt for this stack.

API surface is TorchServe-compatible:
  GET  /ping                      -> {"status": "Healthy"}
  POST /predictions/<model>       -> per-image JSON in the reference
       handler's format (mmdet_handler.py:46-69): a list of
       {"<class_name>": [x1, y1, x2, y2], "score": s} for score >=
       --score-thr. Body is raw image bytes, or JSON
       {"data": <base64>} like TorchServe's b64 path
       (mmdet_handler.py:33-36).

Architecture (the TPU-shaped part):
  - ONE compiled program at a fixed batch size serves every request:
    static shapes mean one XLA compile, no warmup jitter after startup.
  - Dynamic micro-batching: requests queue up; a dispatcher thread
    collects up to --batch of them or waits at most --max-batch-delay ms
    (TorchServe's knob of the same name), pads the batch to the static
    size, runs one device call, and fans results back out.
  - JPEG decode + letterbox runs in the native C++ loader
    (tpudet/ops/native/jpeg_loader.cc) — GIL-free, so HTTP threads and
    host preprocessing scale with cores.
"""
import argparse
import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue

import numpy as np


class ModelServer:
    """Batched inference core, independent of the HTTP front-end."""

    def __init__(self, config, checkpoint=None, batch=8, img_size=640,
                 score_thr=0.5, max_batch_delay_ms=10.0):
        import jax.numpy as jnp

        from tpudet.apis.inference import init_detector
        self.detector = init_detector(config, checkpoint)
        self.batch = batch
        self.img_size = img_size
        self.score_thr = score_thr
        self.max_batch_delay = max_batch_delay_ms / 1000.0
        self._queue: Queue = Queue()
        self._stop = threading.Event()
        self._jnp = jnp

        # warm the compiled program at the serving shape before accepting
        # traffic so the first request doesn't pay the XLA compile
        dummy = np.zeros((batch, img_size, img_size, 3), np.float32)
        sf = np.ones((batch, 4), np.float32)
        res = self.detector(dummy, sf)
        np.asarray(res.valid)
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()

    # -- preprocessing ----------------------------------------------------
    def _decode(self, body: bytes):
        """image bytes -> (normalized canvas, scale_factor) or None."""
        import cv2

        from tpudet.ops.native import jpeg_native
        canvas = None
        if body[:2] == b'\xff\xd8' and jpeg_native.available():
            out = jpeg_native.decode_letterbox(
                body, self.img_size, self.img_size, pad_val=114, bgr=True)
            if out is not None:
                canvas, sf = out
        if canvas is not None:
            hw = jpeg_native.jpeg_info(body)
        else:
            img = cv2.imdecode(np.frombuffer(body, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                return None
            h, w = img.shape[:2]
            f = min(self.img_size / h, self.img_size / w)
            nw, nh = int(w * f + 0.5), int(h * f + 0.5)
            img = cv2.resize(img, (nw, nh),
                             interpolation=cv2.INTER_LINEAR)
            canvas = np.full((self.img_size, self.img_size, 3), 114,
                             np.uint8)
            canvas[:nh, :nw] = img
            sf = np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
            hw = (h, w)
        # BGR -> RGB + the yolo norm (mean 114 / std 255), float32 host
        # side; the batch is stacked and shipped once
        norm = (canvas[..., ::-1].astype(np.float32) - 114.0) / 255.0
        return norm, sf, hw

    # -- batching ---------------------------------------------------------
    def submit(self, body: bytes, timeout=30.0):
        """Blocking: enqueue one image, wait for its detections."""
        done = threading.Event()
        slot = {}
        self._queue.put((body, slot, done))
        if not done.wait(timeout):
            raise TimeoutError('inference timed out')
        if 'error' in slot:
            raise ValueError(slot['error'])
        return slot['result']

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_batch_delay
            while len(items) < self.batch:
                rest = deadline - time.monotonic()
                if rest <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=rest))
                except Empty:
                    break
            self._run_batch(items)

    def _run_batch(self, items):
        imgs = np.zeros((self.batch, self.img_size, self.img_size, 3),
                        np.float32)
        sfs = np.ones((self.batch, 4), np.float32)
        ok = []
        for i, (body, slot, done) in enumerate(items):
            dec = self._decode(body)
            if dec is None:
                slot['error'] = 'undecodable image'
                done.set()
                continue
            imgs[len(ok)], sfs[len(ok)], hw = dec
            ok.append((slot, done, hw))
        if not ok:
            return
        try:
            res = self.detector(imgs, sfs)
            bboxes = np.asarray(res.bboxes)
            scores = np.asarray(res.scores)
            labels = np.asarray(res.labels)
            valid = np.asarray(res.valid)
        except Exception as e:  # device failure: fail the whole batch
            for slot, done, _ in ok:
                slot['error'] = f'inference failed: {e}'
                done.set()
            return
        for i, (slot, done, hw) in enumerate(ok):
            slot['result'] = self._format(bboxes[i], scores[i], labels[i],
                                          valid[i], hw)
            done.set()

    def _format(self, bboxes, scores, labels, valid, hw):
        """Reference handler's output format (mmdet_handler.py:57-67);
        boxes clipped to the original image frame like the eval path's
        per-image img_shape clip."""
        out = []
        classes = self.detector.CLASSES
        keep = valid & (scores >= self.score_thr)
        h, w = hw if hw is not None else (None, None)
        for j in np.nonzero(keep)[0]:
            x1, y1, x2, y2 = (float(v) for v in bboxes[j])
            if w is not None:
                x1, x2 = np.clip([x1, x2], 0.0, float(w))
                y1, y2 = np.clip([y1, y2], 0.0, float(h))
            out.append({
                str(classes[int(labels[j])]): [x1, y1, x2, y2],
                'score': float(scores[j]),
            })
        return out

    def close(self):
        self._stop.set()
        self._dispatcher.join(timeout=2)


def make_handler(server: ModelServer, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                self._send(200, {'status': 'Healthy'})
            else:
                self._send(404, {'error': 'not found'})

        def do_POST(self):
            if not self.path.startswith('/predictions/'):
                self._send(404, {'error': 'not found'})
                return
            name = self.path.split('/predictions/', 1)[1].strip('/')
            if name != model_name:
                self._send(404, {'error': f'unknown model {name!r}'})
                return
            length = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(length)
            ctype = self.headers.get('Content-Type', '')
            if ctype.startswith('application/json'):
                try:
                    data = json.loads(body)
                    body = base64.b64decode(data['data'])
                except (ValueError, KeyError):
                    self._send(400, {'error': 'bad json body'})
                    return
            try:
                result = server.submit(body)
            except ValueError as e:
                self._send(400, {'error': str(e)})
                return
            except TimeoutError as e:
                self._send(503, {'error': str(e)})
                return
            self._send(200, result)

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--model-name', default='model')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--batch', type=int, default=8,
                   help='static serving batch (one compiled program)')
    p.add_argument('--img-size', type=int, default=640)
    p.add_argument('--score-thr', type=float, default=0.5,
                   help='reference handler default (mmdet_handler.py:12)')
    p.add_argument('--max-batch-delay', type=float, default=10.0,
                   help='ms to wait filling a batch (TorchServe knob)')
    args = p.parse_args()

    server = ModelServer(args.config, args.checkpoint, batch=args.batch,
                         img_size=args.img_size, score_thr=args.score_thr,
                         max_batch_delay_ms=args.max_batch_delay)
    httpd = ThreadingHTTPServer(('0.0.0.0', args.port),
                                make_handler(server, args.model_name))
    print(f'serving {args.model_name!r} on :{args.port} '
          f'(batch {args.batch}, img {args.img_size})')
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == '__main__':
    main()
