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


# request bodies are image uploads; the reference's libev server caps the
# request buffer similarly (serve/serve.c) — 64 MB covers any sane image
MAX_BODY_BYTES = 64 * 1024 * 1024


class RequestError(Exception):
    """Client error with an HTTP status (maps to 4xx, not 500)."""

    def __init__(self, code: int, msg: str):
        super().__init__(msg)
        self.code = code


def _decode_image(data: bytes, gray: bool):
    from ccv_tpu.core import io as cio

    if not data:
        raise RequestError(400, "empty image body")
    # suffix selects the decoder's gray coefficients (libpng vs libjpeg
    # formulas differ by rounding); sniff the actual format
    suffix = ".jpg" if data[:2] == b"\xff\xd8" else ".png"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        path = f.name
    try:
        img = cio.read(path, cio.IO_GRAY if gray else cio.IO_RGB_COLOR)
        return np.asarray(img.numpy())
    except Exception:
        raise RequestError(400, "undecodable image")
    finally:
        os.unlink(path)


def _parse_multipart(handler) -> dict:
    """All multipart fields by name: file parts -> bytes, strings -> str.
    Non-multipart bodies come back as {"source": body} (the reference's
    uri.c accepts both raw-body and form posts)."""
    try:
        length = int(handler.headers.get("Content-Length", 0))
    except (TypeError, ValueError):
        raise RequestError(400, "bad Content-Length")
    if length < 0 or length > MAX_BODY_BYTES:
        raise RequestError(413, f"body exceeds {MAX_BODY_BYTES} bytes")
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    m = re.search(r'boundary=("?)([^";]+)\1', ctype)
    if not m:
        return {"source": body}
    boundary = m.group(2).encode()
    fields: dict = {}
    for part in body.split(b"--" + boundary):
        idx = part.find(b"\r\n\r\n")
        if idx < 0:
            continue
        head = part[:idx].decode("latin-1")
        nm = re.search(r'name=("?)([^";\r\n]+)\1', head)
        if not nm:
            continue
        payload = part[idx + 4:]
        # the boundary split leaves one CRLF (and, on the final part, the
        # closing "--") — strip exactly that, never payload bytes
        if payload.endswith(b"--"):
            payload = payload[:-2]
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        if "filename=" in head:
            fields[nm.group(2)] = payload
        else:
            fields[nm.group(2)] = payload.decode("utf-8", "replace")
    return fields


def _extract_body(handler) -> bytes:
    fields = _parse_multipart(handler)
    src = fields.get("source")
    if src is None:  # first file-ish field
        for v in fields.values():
            if isinstance(v, bytes):
                return v
        return b""
    return src if isinstance(src, bytes) else src.encode()


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


def _convnet(fields):
    """serve/convnet.c twin: classify with a reference convnet SQLite
    model ("model" = path under --models-dir); returns top-5
    with image-net words when the .words file sits next to the model."""
    from ccv_tpu.models.convnet import Convnet

    model = fields.get("model", "image-net-2012.sqlite3")
    path = os.path.realpath(os.path.join(MODELS_DIR, model))
    # like the reference server, only models under --models-dir are served
    if not path.startswith(os.path.realpath(MODELS_DIR) + os.sep):
        raise ValueError(f"model must live under the models dir: {model}")
    if not os.path.exists(path):
        raise FileNotFoundError(f"convnet model not found: {model}")
    if path not in _cache:
        _cache[path] = Convnet.read(path)
    img = _decode_image(fields["source"], gray=False)
    ranks = _cache[path].classify(img, tops=5)
    words_path = os.path.join(MODELS_DIR, "image-net-2012.words")
    words = None
    if os.path.exists(words_path):
        with open(words_path) as f:
            words = [ln.strip() for ln in f]
    return [{"id": int(i) + 1, "confidence": float(c),
             **({"word": words[int(i)]} if words and int(i) < len(words)
                else {})}
            for i, c in ranks]


def _tld(fields):
    """serve/tld.c twin: stateless track step — multipart "previous" +
    "source" frames and the box (x, y, width, height) in the previous
    frame; returns the tracked box."""
    from ccv_tpu.detectors import tld

    for req in ("previous", "source", "x", "y", "width", "height"):
        if req not in fields:
            raise ValueError(f"missing field '{req}'")
    prev = _decode_image(fields["previous"], gray=True)
    cur = _decode_image(fields["source"], gray=True)
    box = tuple(int(float(fields[k])) for k in ("x", "y", "width", "height"))
    t = tld.Tld(prev, box)
    out, conf = t.track_object(prev, cur)
    if out is None:
        return {"found": False}
    return {"found": bool(t.found), "x": int(out[0]), "y": int(out[1]),
            "width": int(out[2]), "height": int(out[3]),
            "confidence": float(conf)}


ENDPOINTS = {
    "/scd/detect.objects": (_scd, False),
    "/bbf/detect.objects": (_bbf, True),
    "/icf/detect.objects": (_icf, False),
    "/dpm/detect.objects": (_dpm, False),
    "/swt/detect.words": (_swt, True),
    "/sift": (_sift, True),
    "/mser": (_mser, True),
}

# endpoints that receive ALL form fields (not just the image)
FIELD_ENDPOINTS = {
    "/convnet/classify": _convnet,
    "/tld/track.object": _tld,
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
        all_eps = sorted(list(ENDPOINTS) + list(FIELD_ENDPOINTS))
        if self.path in ("/", ""):
            self._json(200, all_eps)
        else:
            self._json(404, {"error": "unknown endpoint",
                             "endpoints": all_eps})

    def do_POST(self):  # noqa: N802
        try:
            if self.path in FIELD_ENDPOINTS:
                fields = _parse_multipart(self)
                with _lock:
                    out = FIELD_ENDPOINTS[self.path](fields)
            elif self.path in ENDPOINTS:
                fn, gray = ENDPOINTS[self.path]
                img = _decode_image(_extract_body(self), gray)
                with _lock:
                    out = fn(img)
            else:
                self._json(404, {"error": "unknown endpoint",
                                 "endpoints": sorted(
                                     list(ENDPOINTS) + list(FIELD_ENDPOINTS))})
                return
            self._json(200, out)
        except RequestError as e:
            self._json(e.code, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 - report to the client
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):
        pass


class Server(ThreadingHTTPServer):
    """Threaded server with a deep accept backlog (the default 5 drops
    connections under concurrent load) and bounded per-request lifetime."""

    request_queue_size = 128
    daemon_threads = True
    timeout = 60


def main():
    global MODELS_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=3350)
    ap.add_argument("--models-dir", default=MODELS_DIR)
    args = ap.parse_args()
    MODELS_DIR = args.models_dir
    srv = Server(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
