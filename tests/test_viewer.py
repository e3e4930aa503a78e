"""Viewer server test: spin it up on a random port, fetch page + frames."""

import threading
import urllib.request

import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.utils.fixtures import naive_gaussians


def test_viewer_serves_page_and_frames(tmp_path):
    import splat_tpu.viewer.server as vs

    scene = naive_gaussians()
    cam = Camera.create(h=48, w=64, position=(0.0, 0.0, 4.0))

    # run serve() on an ephemeral port in a daemon thread
    ready = threading.Event()
    holder = {}

    real_serve_forever = vs.ThreadingHTTPServer.serve_forever

    def hooked(self, *a, **kw):
        holder["port"] = self.server_address[1]
        ready.set()
        real_serve_forever(self)

    vs.ThreadingHTTPServer.serve_forever = hooked
    try:
        t = threading.Thread(
            target=vs.serve,
            args=(scene, cam, RenderConfig()),
            kwargs={"port": 0, "method": "dense"},
            daemon=True)
        t.start()
        assert ready.wait(60), "server did not start"
        port = holder["port"]

        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60).read()
        assert b"splat_tpu viewer" in page

        png1 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png?yaw=0&pitch=0&dist=1",
            timeout=120).read()
        assert png1[:8] == b"\x89PNG\r\n\x1a\n"
        png2 = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png?yaw=0.8&pitch=0&dist=1",
            timeout=120).read()
        assert png2 != png1  # pose change re-renders

        from splat_tpu.utils.image import read_png
        f = tmp_path / "f.png"
        f.write_bytes(png1)
        img = read_png(str(f))
        assert img.shape == (48, 64, 3)

        # live mode toggle (browser 'M' key -> mode=depth query param)
        png_d = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png?yaw=0&pitch=0&dist=1"
            f"&mode=depth", timeout=120).read()
        assert png_d[:8] == b"\x89PNG\r\n\x1a\n"
        assert png_d != png1
        fd = tmp_path / "d.png"
        fd.write_bytes(png_d)
        dimg = read_png(str(fd))
        # grayscale to within one u8 step (channel-lane f32 drift)
        assert np.abs(dimg[..., 0].astype(int)
                      - dimg[..., 1].astype(int)).max() <= 1

        # raw RGBA transport: exact byte count, headers carry dimensions
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.raw?yaw=0&pitch=0&dist=1",
            timeout=120)
        raw = r.read()
        assert int(r.headers["X-Splat-W"]) == 64
        assert int(r.headers["X-Splat-H"]) == 48
        assert len(raw) == 48 * 64 * 4
        rgba = np.frombuffer(raw, np.uint8).reshape(48, 64, 4)
        assert (rgba[..., 3] == 255).all()
        # same pose, same pixels as the PNG transport
        np.testing.assert_array_equal(rgba[..., :3], img)

        # live resolution ladder: scale=0.5 renders at half size
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.raw?yaw=0&pitch=0&dist=1"
            f"&scale=0.5", timeout=120)
        half = r.read()
        assert int(r.headers["X-Splat-W"]) == 32
        assert int(r.headers["X-Splat-H"]) == 24
        assert len(half) == 24 * 32 * 4

        code = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/nope", timeout=30).getcode()
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        vs.ThreadingHTTPServer.serve_forever = real_serve_forever
