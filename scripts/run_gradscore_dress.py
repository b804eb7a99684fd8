"""One-off driver: bench_e2e_gradscore_dress on the real TPU, result to
bench_runs/gradscore_dress_<ts>.json (VERDICT r5 #1)."""
import importlib.util
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/colormipsearch_tpu/jax"))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(repo, "bench.py"))
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
mask_rgb, target_rgb, _hs, _rg = m.build_workload()
out = m.bench_e2e_gradscore_dress(mask_rgb, target_rgb)
stamp = time.strftime("%Y%m%dT%H%M%S")
path = os.path.join(repo, "bench_runs", f"gradscore_dress_{stamp}.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"saved": path,
                  "host": out["host_pack"]["targets_per_s"],
                  "device": out["device_store"]["targets_per_s"],
                  "speedup": out["speedup_device_over_host"]}))
