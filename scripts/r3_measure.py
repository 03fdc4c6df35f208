"""Round-3 pending TPU measurement queue.

Polls the remote-TPU backend; once it is reachable, runs the measurements
that were blocked by tunnel downtime, strictly serially:
  1. pose_256 + face_512_K8 whole-clip fps  -> merged into BENCH_EXTRA.json
  2. flagship bench.py JSON                 -> /tmp/bench_r3.json
  3. bench.py --latency p50/p99             -> /tmp/latency_r3.json
  4. pose 512x256 bs4 training step         -> stdout (train_bench format)

Each sub-run is a subprocess so one failure doesn't kill the queue.
Usage: python scripts/r3_measure.py [max_wait_seconds]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_WAIT = int(sys.argv[1]) if len(sys.argv) > 1 else 7200
ENV = dict(os.environ,
           PYTHONPATH=f"{REPO}:/root/.axon_site")


def probe(timeout=90):
    r = subprocess.run(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        env=ENV, capture_output=True, timeout=timeout + 10, text=True,
        cwd=REPO)
    return r.returncode == 0 and r.stdout.strip().isdigit()


def run(tag, code, timeout):
    print(f"=== {tag} ===", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    print(r.stdout[-4000:], flush=True)
    if r.returncode != 0:
        print(f"[{tag} FAILED rc={r.returncode}]\n{r.stderr[-2500:]}",
              flush=True)
    print(f"[{tag}: {time.time() - t0:.0f}s]", flush=True)
    return r.returncode == 0


BENCH_PAIR = """
import json, sys
sys.argv = ["bench.py"]
import bench
from fsvid2vid_tpu.config import face_config, pose_config
from fsvid2vid_tpu.cache import enable_compilation_cache
enable_compilation_cache()
res = {}
for name, cfg, k in [
    ("pose_256", pose_config(is_train=False, fine_size=256, load_size=256), 1),
    ("face_512_K8_attention", face_config(is_train=False, fine_size=512,
                                          load_size=512, n_shot=8), 8)]:
    try:
        res[name] = round(bench.bench_config(cfg, k=k), 3)
        print(name, res[name], "fps", flush=True)
    except Exception as e:
        res[name] = f"failed: {e}"
        print(name, "failed:", e, flush=True)
with open("BENCH_EXTRA.json") as f:
    data = json.load(f)
data.update(res)
with open("BENCH_EXTRA.json", "w") as f:
    json.dump(data, f, indent=2)
print(json.dumps(data))
"""

FLAGSHIP = """
import sys, json, io, contextlib
sys.argv = ["bench.py"]
import bench
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
line = buf.getvalue().strip().splitlines()[-1]
print(line)
with open("/tmp/bench_r3.json", "w") as f:
    f.write(line + "\\n")
"""

LATENCY = """
import sys, json
sys.argv = ["bench.py", "--latency"]
import bench
out = bench.bench_latency()
with open("/tmp/latency_r3.json", "w") as f:
    json.dump(out, f)
"""

TRAIN_POSE = """
import sys
sys.argv = ["train_bench.py", "pose", "4", "4"]
sys.path.insert(0, "scripts")
import importlib.util as u
spec = u.spec_from_file_location("tb", "scripts/train_bench.py")
m = u.module_from_spec(spec); spec.loader.exec_module(m)
m.main()
"""

FLOWGEN = """
import sys
sys.argv = ["flowgen_bench.py", "512"]
import importlib.util as u
spec = u.spec_from_file_location("fb", "scripts/flowgen_bench.py")
m = u.module_from_spec(spec); spec.loader.exec_module(m)
m.main()
"""


def main():
    t0 = time.time()
    while time.time() - t0 < MAX_WAIT:
        try:
            if probe():
                print(f"[tunnel up after {time.time() - t0:.0f}s]",
                      flush=True)
                break
        except subprocess.TimeoutExpired:
            pass
        print(f"[tunnel down, waiting... {time.time() - t0:.0f}s]",
              flush=True)
        time.sleep(240)
    else:
        print("[gave up waiting for the tunnel]", flush=True)
        return 1

    run("bench pose+K8", BENCH_PAIR, 5400)
    run("bench flagship", FLAGSHIP, 3600)
    run("bench latency", LATENCY, 3600)
    run("train_bench pose", TRAIN_POSE, 5400)
    run("flowgen ablation 512", FLOWGEN, 5400)
    return 0


if __name__ == "__main__":
    sys.exit(main())
