"""Interactive viewer: a local HTTP server streaming rendered frames.

The TPU-native replacement for the reference's minifb window + arrow-key
loop (reference: src/main.rs:41-80).  A TPU host is headless, so instead of
an OS window the viewer serves a small HTML page; the browser sends pose
updates (arrow keys = +-10 degrees yaw/pitch like the reference, R = reset,
drag to orbit, wheel to dolly) and fetches re-rendered PNG frames.  Like the
reference's dirty-flag loop, a frame is only rendered when the pose changed.

Stdlib-only (http.server); frames are encoded with the pure-python PNG
writer.  Single render thread — the device is serialized behind a lock.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>splat_tpu viewer</title><style>
 body { margin:0; background:#111; color:#ccc; font:13px monospace; }
 #hud { position:fixed; top:8px; left:8px; background:#000a; padding:6px 10px;
        border-radius:4px; white-space:pre; }
 img  { display:block; margin:0 auto; image-rendering:pixelated; }
</style></head>
<body>
<div id="hud">loading…</div>
<img id="view" width="__W__" height="__H__">
<script>
let yaw = 0, pitch = 0, dist = 1.0, busy = false, dirty = true, t0 = 0;
let mode = '__MODE__';
const hud = document.getElementById('hud');
const img = document.getElementById('view');
async function tick() {
  if (dirty && !busy) {
    busy = true; dirty = false; t0 = performance.now();
    const q = `yaw=${yaw}&pitch=${pitch}&dist=${dist}&mode=${mode}&t=${Date.now()}`;
    let overflow = 0;
    try {
      const r = await fetch('/frame.png?' + q);
      overflow = parseInt(r.headers.get('X-Splat-Overflow') || '0');
      const url = URL.createObjectURL(await r.blob());
      img.src = url;
      await img.decode().catch(()=>{});
      URL.revokeObjectURL(url);
    } catch (e) {}
    const ms = (performance.now() - t0).toFixed(0);
    hud.textContent =
      `yaw ${(yaw*180/Math.PI).toFixed(1)}°  pitch ${(pitch*180/Math.PI).toFixed(1)}°` +
      `  dist x${dist.toFixed(2)}  mode ${mode}  frame ${ms} ms\\n` +
      `arrows: orbit (±10°)   drag: orbit   wheel: dolly   R: reset   M: color/depth` +
      (overflow > 0 ? `\\nWARNING: ${overflow} pairs dropped — ` +
                      `frame truncated; restart with a larger --dup-factor`
                    : '');
    busy = false;
  }
  requestAnimationFrame(tick);
}
const STEP = 10 * Math.PI / 180;           // reference: ±10° per keypress
addEventListener('keydown', e => {
  if (e.key === 'ArrowLeft')  { yaw -= STEP; dirty = true; }
  if (e.key === 'ArrowRight') { yaw += STEP; dirty = true; }
  if (e.key === 'ArrowUp')    { pitch += STEP; dirty = true; }
  if (e.key === 'ArrowDown')  { pitch -= STEP; dirty = true; }
  if (e.key === 'r' || e.key === 'R') { yaw = 0; pitch = 0; dist = 1; dirty = true; }
  if (e.key === 'm' || e.key === 'M') {
    mode = (mode === 'depth') ? 'color' : 'depth'; dirty = true;
  }
});
let dragging = false, lx = 0, ly = 0;
img.addEventListener('mousedown', e => { dragging = true; lx = e.clientX; ly = e.clientY; });
addEventListener('mouseup', () => dragging = false);
addEventListener('mousemove', e => {
  if (!dragging) return;
  yaw   += (e.clientX - lx) * 0.01;
  pitch -= (e.clientY - ly) * 0.01;
  lx = e.clientX; ly = e.clientY; dirty = true;
});
addEventListener('wheel', e => {
  dist = Math.min(10, Math.max(0.1, dist * (e.deltaY > 0 ? 1.1 : 0.9)));
  dirty = true;
});
tick();
</script></body></html>
"""


def serve(scene, camera, config=None, *, host: str = "127.0.0.1",
          port: int = 8000, method: str = "auto",
          png_level: int = 0) -> None:
    """Serve the interactive viewer (blocking).  Ctrl-C to stop.

    png_level: zlib level for served frames.  Default 0 (stored blocks):
    encoding a 1080p frame costs ~17 ms vs ~340 ms at level 3 (measured)
    for ~3x the bytes — encode latency IS serving latency on localhost;
    raise it for remote viewing over thin links.
    """
    import dataclasses

    import jax

    from splat_tpu.config import RenderConfig
    from splat_tpu.render.api import render_fn, resolve_method
    from splat_tpu.utils.compilecache import enable_persistent_cache
    from splat_tpu.utils.image import encode_png

    enable_persistent_cache()
    config = config or RenderConfig()

    # The tiled path renders with stats so duplication-buffer overflow is
    # surfaced in the HUD — the viewer must not be the one public render
    # surface that can truncate silently (config.py contract).
    # Render functions are built lazily per render mode: the browser's 'M'
    # key toggles color/depth live (one extra compile on first toggle).
    m = resolve_method(method, scene)
    fns: dict[str, object] = {}

    def get_fn(mode: str):
        if mode not in fns:
            cfg = dataclasses.replace(config, render_mode=mode)
            if m == "tiled":
                from splat_tpu.render.tiled import render_tiled

                fns[mode] = jax.jit(
                    lambda s, c: render_tiled(s, c, cfg, return_stats=True))
            else:
                f_plain = render_fn(m, cfg)
                fns[mode] = lambda s, c: (f_plain(s, c), None)
        return fns[mode]

    scene = scene.pack_device()
    lock = threading.Lock()
    base_pos = np.asarray(jax.device_get(camera.position))
    target = np.asarray(jax.device_get(camera.target))

    def render_pose(yaw: float, pitch: float, dist: float,
                    mode: str) -> tuple[bytes, int]:
        cam = camera.with_pose(
            yaw=yaw, pitch=pitch,
            position=target + (base_pos - target) * dist)
        with lock:
            img, stats = get_fn(mode)(scene, cam)
            overflow = int(stats["overflow"]) if stats is not None else 0
            img = np.asarray(img)
        return encode_png(img, level=png_level), overflow

    page = (_PAGE.replace("__W__", str(camera.w))
            .replace("__H__", str(camera.h))
            .replace("__MODE__", config.render_mode))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            if u.path == "/":
                body = page.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif u.path == "/frame.png":
                q = parse_qs(u.query)
                get = lambda k, d: float(q.get(k, [d])[0])
                mode = q.get("mode", [config.render_mode])[0]
                if mode not in ("color", "depth"):
                    mode = config.render_mode
                try:
                    png, overflow = render_pose(
                        get("yaw", 0.0), get("pitch", 0.0),
                        get("dist", 1.0), mode)
                except Exception as e:  # surface render errors to the client
                    msg = f"render error: {e}".encode()
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.send_header("X-Splat-Overflow", str(overflow))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(png)
            else:
                self.send_response(404)
                self.end_headers()

    srv = ThreadingHTTPServer((host, port), Handler)
    print(f"splat_tpu viewer on http://{host}:{srv.server_address[1]}/ "
          f"(N={scene.num_gaussians}, {camera.w}x{camera.h})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
