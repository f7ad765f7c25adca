"""Parse a jax.profiler xplane trace: per-op durations on the TPU device plane.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/parse_profile.py /tmp/jaxprof [top_n]

Aggregates XEvent durations by event name over the device plane(s) and prints
the top-N ops by total self time. Relies only on the xplane proto shipped
inside tensorflow (no tensorboard profile plugin conversion, which is broken
against this TF build).
"""

import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

paths = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
if not paths:
    sys.exit(f"no .xplane.pb under {root}")
path = paths[-1]
xspace = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xspace.ParseFromString(f.read())

for plane in xspace.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    totals = defaultdict(float)
    counts = defaultdict(int)
    for line in plane.lines:
        # XLA Ops line carries per-HLO events; step lines etc. are skipped
        if line.name not in ("XLA Ops", "XLA Modules", "Steps") and "op" not in line.name.lower():
            continue
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            totals[name] += ev.duration_ps / 1e9  # ms
            counts[name] += 1
    if not totals:
        continue
    print(f"== plane: {plane.name} (total {sum(totals.values()):.2f} ms over all events)")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:110]}")
