"""``gctpu-viewer`` — minimal interactive scene viewer (≈ ``ns-viewer``).

The reference's viewer (gc_viewer.py) serves the scene over viser websockets;
viser isn't available here, so this is a small self-contained HTTP viewer: an
orbit-controls HTML page that requests renders at poses from a jitted render
endpoint. Capabilities mirrored: load a checkpoint, render rgb/depth on
demand, interactive orbiting.

Usage: gctpu-viewer --ckpt outputs/.../ckpts --data data/bear [--port 7007]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>gctpu viewer</title><style>
body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#c{display:block;margin:auto;cursor:grab}
#hud{position:fixed;top:8px;left:8px;font-size:13px}
</style></head><body>
<div id=hud>drag: orbit &nbsp; wheel: zoom &nbsp; key d: depth</div>
<img id=c width=512 height=512>
<script>
let az=0, el=0.3, r=3.5, depth=false, busy=false, dirty=true;
const img=document.getElementById('c');
function refresh(){ if(busy) {dirty=true; return;} busy=true; dirty=false;
  img.src=`/render?az=${az.toFixed(3)}&el=${el.toFixed(3)}&r=${r.toFixed(3)}&depth=${depth?1:0}&t=${Date.now()}`;
}
img.onload=()=>{busy=false; if(dirty) refresh();};
img.onerror=()=>{busy=false;};
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; az+=(e.clientX-lx)*0.01; el+=(e.clientY-ly)*0.01;
  el=Math.max(-1.4,Math.min(1.4,el)); lx=e.clientX;ly=e.clientY; refresh();};
window.onwheel=e=>{r*=Math.exp(e.deltaY*0.001); refresh();};
window.onkeydown=e=>{if(e.key=='d'){depth=!depth; refresh();}};
refresh();
</script></body></html>"""


def serve(gs, model_cfg, port: int = 7007, size: int = 512, center=None, radius=3.5):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..cameras import look_at, make_camera
    from ..models.gaussians import GaussianState
    from ..models.splat_model import render_model
    from ..utils.colormaps import apply_depth_colormap

    center = np.zeros(3) if center is None else np.asarray(center)

    render_jit = jax.jit(
        lambda p, a, cam: render_model(GaussianState(p, a), cam, 30_000, model_cfg)
    )

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())
                return
            if u.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(u.query)
            az = float(q.get("az", [0])[0])
            el = float(q.get("el", [0.3])[0])
            r = float(q.get("r", [radius])[0])
            want_depth = q.get("depth", ["0"])[0] == "1"
            eye = center + r * np.array(
                [np.cos(el) * np.sin(az), -np.cos(el) * np.cos(az), np.sin(el)]
            )
            cam = make_camera(
                look_at(eye, center), size * 1.05, size * 1.05, size / 2, size / 2, size, size
            )
            with lock:
                out = render_jit(gs.params, gs.alive, cam)
                if want_depth and out.depth is not None:
                    img = apply_depth_colormap(np.asarray(out.depth), np.asarray(out.alpha))
                else:
                    img = np.clip(np.asarray(out.rgb), 0, 1)
            buf = io.BytesIO()
            Image.fromarray((img * 255).astype(np.uint8)).save(buf, "JPEG", quality=90)
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.end_headers()
            self.wfile.write(buf.getvalue())

    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"viewer at http://localhost:{port}/")
    return httpd


def main(argv=None):
    from .render import _load_state
    from ..models.splat_model import SplatModelConfig
    from ..ops.renderer import RenderConfig

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args(argv)
    gs = _load_state(args)
    cfg = SplatModelConfig(background_color="white", render=RenderConfig(impl="auto"))
    httpd = serve(gs, cfg, args.port, args.size)
    httpd.serve_forever()


def entrypoint():
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
