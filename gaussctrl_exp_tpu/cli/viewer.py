"""``gctpu-viewer`` — minimal interactive scene viewer (≈ ``ns-viewer``).

The reference's viewer (gc_viewer.py) serves the scene over viser websockets;
viser isn't available here, so this is a small self-contained HTTP viewer: an
orbit-controls HTML page that requests renders at poses from a jitted render
endpoint. Capabilities mirrored: load a checkpoint, render rgb/depth on
demand, interactive orbiting — and LIVE ATTACH to a running trainer
(gc_trainer.py:96-109): the page polls /status for step/loss, re-renders as
the scene trains, and a Reset button restores the unedited images
(DataManager.reset_images — the reference's viewer reset control,
gc_trainer.py:136-144).

Usage:
  gctpu-viewer --ckpt outputs/.../ckpts [--port 7007]     # from checkpoint
  gctpu-train ... --viewer-port 7007                       # live, in-train
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
#reset{position:fixed;top:8px;right:8px}
</style></head><body>
<div id=hud>drag: orbit &nbsp; wheel: zoom &nbsp; key d: depth<br><span id=st></span></div>
<button id=reset onclick="fetch('/reset',{method:'POST'}).then(()=>refresh())">Reset to unedited</button>
<img id=c width=512 height=512>
<script>
let az=0, el=0.3, r=3.5, depth=false, busy=false, dirty=true, laststep=-1;
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
setInterval(()=>{fetch('/status').then(r=>r.json()).then(s=>{
  document.getElementById('st').textContent =
    s.live ? `step ${s.step}  loss ${(s.loss??0).toFixed(4)}` : 'checkpoint view';
  if(s.live && s.step!=laststep){laststep=s.step; refresh();}
});}, 1000);
refresh();
</script></body></html>"""


def serve(gs=None, model_cfg=None, port: int = 7007, size: int = 512, center=None,
          radius=3.5, state_fn=None, on_reset=None):
    """HTTP viewer server.

    Static mode: pass ``gs`` (a GaussianState snapshot).
    Live mode (the gc_trainer.py:96-144 capability): pass ``state_fn`` —
    a zero-arg callable returning (params, alive, step:int, loss:float|None)
    read fresh on every request — and optionally ``on_reset`` (wired to
    DataManager.reset_images by the train CLI).
    """
    import jax
    from PIL import Image

    from ..cameras import look_at, make_camera
    from ..models.gaussians import GaussianState
    from ..models.splat_model import render_model
    from ..utils.colormaps import apply_depth_colormap

    center = np.zeros(3) if center is None else np.asarray(center)
    live = state_fn is not None
    if not live:
        snap = (gs.params, gs.alive)
        state_fn = lambda: (snap[0], snap[1], 0, None)  # noqa: E731

    render_jit = jax.jit(
        lambda p, a, cam: render_model(GaussianState(p, a), cam, 30_000, model_cfg)
    )

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            if urlparse(self.path).path == "/reset" and on_reset is not None:
                on_reset()
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_response(404)
                self.end_headers()

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())
                return
            if u.path == "/status":
                _, _, step, loss = state_fn()
                body = json.dumps(
                    {"live": live, "step": int(step), "loss": None if loss is None else float(loss)}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
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
                params, alive, _, _ = state_fn()
                out = render_jit(params, alive, cam)
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


def attach_live_viewer(trainer, datamanager, model_cfg, port: int, size: int = 512):
    """Start the viewer on a daemon thread, attached to a RUNNING trainer:
    renders trainer.state as it evolves, /status reports step + last loss,
    /reset restores unedited train images (gc_trainer.py:136-144)."""

    def state_fn():
        st = trainer.state
        loss = trainer.history[-1]["main_loss"] if trainer.history else None
        return st.params, st.alive, trainer.step, loss

    httpd = serve(
        model_cfg=model_cfg, port=port, size=size,
        state_fn=state_fn, on_reset=datamanager.reset_images,
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
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
