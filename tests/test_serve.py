"""HTTP facade smoke test (serve/server.py, reference serve/)."""

import json
import os
import sys
import threading
import urllib.request


def test_serve_endpoints():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "serve"))
    import server
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), server.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            eps = json.loads(r.read())
        assert "/scd/detect.objects" in eps
        img = open("/root/reference/samples/scene.png", "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/mser", data=img, method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out) > 100 and {"x", "y", "width", "height",
                                   "size"} <= set(out[0])
    finally:
        srv.shutdown()
