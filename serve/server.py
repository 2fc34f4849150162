#!/usr/bin/env python
"""REST facade (reference: serve/ — libev+libebb HTTP server with
/bbf /dpm /icf /scd /sift /swt /mser endpoints, doc/http.rst).

stdlib http.server twin: POST an image (raw body or multipart field
"source") to an endpoint, get detections as JSON. GET / lists endpoints
("discoverable" like the reference). Model files load lazily from
--models-dir (defaults to the reference samples directory).

    python serve/server.py --port 3350
    curl -F source=@street.png localhost:3350/scd/detect.objects
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import tempfile
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

MODELS_DIR = "/root/reference/samples"
_lock = threading.Lock()  # jax dispatch from one thread at a time
_cache: dict = {}


def _decode_image(data: bytes, gray: bool):
    from ccv_tpu.core import io as cio

    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        img = cio.read(path, cio.IO_GRAY if gray else cio.IO_RGB_COLOR)
        return np.asarray(img.numpy())
    finally:
        os.unlink(path)


def _extract_body(handler) -> bytes:
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    m = re.search(r'boundary=("?)([^";]+)\1', ctype)
    if m:  # multipart/form-data: take the first file part
        boundary = m.group(2).encode()
        for part in body.split(b"--" + boundary):
            idx = part.find(b"\r\n\r\n")
            if idx < 0 or b"filename=" not in part[:idx]:
                continue
            return part[idx + 4:].rstrip(b"\r\n-")
    return body


def _rects(comps):
    return [{"x": int(c.x), "y": int(c.y), "width": int(c.width),
             "height": int(c.height),
             "confidence": float(getattr(c, "confidence", 0.0))}
            for c in comps]


def _scd(img):
    from ccv_tpu.detectors import scd

    if "scd" not in _cache:
        _cache["scd"] = scd.load_cascade(
            os.path.join(MODELS_DIR, "face.sqlite3"))
    return _rects(scd.detect(img, _cache["scd"]))


def _bbf(img):
    from ccv_tpu.detectors import bbf

    if "bbf" not in _cache:
        _cache["bbf"] = bbf.load_cascade(os.path.join(MODELS_DIR, "face"))
    return _rects(bbf.detect_objects(img, _cache["bbf"]))


def _icf(img):
    from ccv_tpu.detectors import icf

    if "icf" not in _cache:
        _cache["icf"] = icf.load_cascade(
            os.path.join(MODELS_DIR, "pedestrian.icf"))
    return _rects(icf.detect_objects(img, _cache["icf"]))


def _dpm(img):
    from ccv_tpu.detectors import dpm

    if "dpm" not in _cache:
        _cache["dpm"] = dpm.read_mixture_model(
            os.path.join(MODELS_DIR, "pedestrian.m"))
    return _rects(dpm.detect(img, _cache["dpm"]))


def _swt(img):
    from ccv_tpu.detectors import swt

    return _rects(swt.detect_words(img))


def _sift(img):
    from ccv_tpu.detectors import sift

    kps, _ = sift.sift(img)
    return [{"x": float(k["x"]), "y": float(k["y"]),
             "scale": float(k["scale"]), "angle": float(k["angle"])}
            for k in kps]


def _mser(img):
    from ccv_tpu.detectors import mser

    kps, _ = mser.mser(img)
    return [{"x": k.x, "y": k.y, "width": k.width, "height": k.height,
             "size": k.size} for k in kps]


ENDPOINTS = {
    "/scd/detect.objects": (_scd, False),
    "/bbf/detect.objects": (_bbf, True),
    "/icf/detect.objects": (_icf, False),
    "/dpm/detect.objects": (_dpm, False),
    "/swt/detect.words": (_swt, True),
    "/sift": (_sift, True),
    "/mser": (_mser, True),
}


class Handler(BaseHTTPRequestHandler):
    def _json(self, code, obj):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802 (stdlib convention)
        if self.path in ("/", ""):
            self._json(200, sorted(ENDPOINTS))
        else:
            self._json(404, {"error": "unknown endpoint",
                             "endpoints": sorted(ENDPOINTS)})

    def do_POST(self):  # noqa: N802
        if self.path not in ENDPOINTS:
            self._json(404, {"error": "unknown endpoint",
                             "endpoints": sorted(ENDPOINTS)})
            return
        fn, gray = ENDPOINTS[self.path]
        try:
            img = _decode_image(_extract_body(self), gray)
            with _lock:
                out = fn(img)
            self._json(200, out)
        except Exception as e:  # noqa: BLE001 - report to the client
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):
        pass


def main():
    global MODELS_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=3350)
    ap.add_argument("--models-dir", default=MODELS_DIR)
    args = ap.parse_args()
    MODELS_DIR = args.models_dir
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
