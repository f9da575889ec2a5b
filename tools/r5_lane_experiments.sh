#!/bin/bash
# Round-5 decisive lane experiments for the arxiv rows (run BEFORE the
# watcher measures arxiv_gat/arxiv_sage: they pick those rows' configs).
#
# Context (r5 measurements, healthy window): arxiv SAGE 0.142 s/epoch and
# arxiv GAT 1.05 s/epoch sit at the XLA row-gather wall (~11ns/row x 2.5M
# edges x 2 row ops/layer-direction). The lane kernel is the only escape,
# but the attach gate's 2x rule rejects arxiv (modeled 12.8ms vs all-row
# 19.5ms). DGL_TPU_LANE_FORCE_ATTACH bypasses the gate; these runs measure
# the real end-to-end lane-vs-XLA outcome. Restarts the suite watcher when
# done.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_lane.log
run() { echo "== $* ==" | tee -a $LOG; timeout "${T:-900}" "$@" 2>&1 | grep -vE "WARNING" | tail -6 | tee -a $LOG; }

# wait for a healthy window (same criterion as the watcher's bulk probe)
python - <<'EOF'
import subprocess, sys, time
PROBE = (
    "import time; import jax, jax.numpy as jnp;"
    "v0=float(jnp.asarray(1.0)+1.0);"
    "x=jnp.ones((1024,1024),jnp.bfloat16);"
    "f=jax.jit(lambda a:a@a); f(x).block_until_ready();"
    "t1=time.time();"
    "r=x\n"
    "for _ in range(20): r=f(r)\n"
    "r.block_until_ready();"
    "d=(time.time()-t1)*1000/20;"
    "drain=float(jnp.max(r.astype(jnp.float32)));"
    "t3=time.time();"
    "v=float(jnp.max(r.astype(jnp.float32)));"
    "fetch=(time.time()-t3)*1000;"
    "print('PROBE_MS', max(d, fetch))"
)
# The experiments are RELATIVE (lane vs XLA, both arms pay the same
# amortized fetch tax under --scan-epochs), so a stable degraded tunnel
# is usable: accept either a healthy probe (<20ms) or two consecutive
# stable degraded probes (<250ms, within 1.5x of each other).
deadline = time.time() + 4 * 3600
prev = None
while time.time() < deadline:
    try:
        p = subprocess.run([sys.executable, "-c", PROBE], capture_output=True,
                           text=True, timeout=120)
        ms = [float(l.split()[1]) for l in p.stdout.splitlines()
              if l.startswith("PROBE_MS")]
    except subprocess.TimeoutExpired:
        ms = []
    # the fetch tax amortizes over --scan-epochs (10), so <=120ms probe
    # costs <=12ms/epoch — inside the noise for a >=30% lane-vs-XLA effect
    if ms and ms[0] < 120:
        print(f"usable (probe={ms[0]:.1f}ms)")
        sys.exit(0)
    if (ms and prev is not None and ms[0] < 250
            and max(ms[0], prev) / max(min(ms[0], prev), 1e-9) < 1.5):
        print(f"stable-degraded (probe={ms[0]:.1f}ms prev={prev:.1f}ms)")
        sys.exit(0)
    prev = ms[0] if ms else None
    print(f"waiting (probe={prev})", flush=True)
    time.sleep(60)
sys.exit(1)
EOF
[ $? -ne 0 ] && { echo "no healthy window in 4h" | tee -a $LOG; exit 1; }

T=900 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_sage.py \
    --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
T=900 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_sage.py \
    --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel --bf16-messages
T=1200 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_gat.py \
    --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
echo "lane experiments done; see $LOG"

# hand the chip back to the suite watcher
nohup python tools/suite_watcher.py >> /tmp/watcher.out 2>&1 &
echo "watcher restarted ($!)"
