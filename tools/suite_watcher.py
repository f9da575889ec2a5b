"""Auto-resume suite watcher for the shared-TPU pool.

The pool goes completely dark for hours (see ROADMAP "Blocked on the
environment"); burning suite rows into a dark chip yields `exit 1`/timeout
rows with zero signal. This watcher:

1. probes chip health in a subprocess under a hard timeout (so the single
   per-process chip grant is always released even when the probe hangs),
2. when a probe comes back fast, runs the MISSING full-suite rows one at a
   time via ``benchmarks/generate_result.py --only <row>``, re-probing
   between rows and falling back to waiting if the pool dies mid-suite,
3. merges each finished row into ``docs/suite_r02/results.json`` (atomic
   replace), so a killed watcher loses at most the in-flight row.

State/log: ``/tmp/suite_watcher.state`` (``waiting``/``running:<row>``) —
other sessions must stay off the TPU while state is ``running:*``.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS = os.environ.get(
    "SUITE_RESULTS", os.path.join(REPO, "docs", "suite_r05", "results.json"))
STATE = "/tmp/suite_watcher.state"
LOG = "/tmp/suite_watcher.log"

# Round 5: the healthy window is the scarce resource, so STEP-SENSITIVE
# and light rows run first (they are the ones a degraded window poisons);
# bulk/heavy rows (usable in a merely-ok window) run after. The three rows
# measured early this round under the degraded tunnel (products/ppa/
# cluster_sage) sort last so a long healthy window re-measures them too.
ROW_ORDER = [
    "arxiv_gat", "arxiv_sage", "pubmed_gat", "cora_sage", "pubmed_sage",
    "cora_gat", "reddit_sage", "enzymes_gcn", "enzymes_gcn_b128",
    "enzymes_gcn_b256", "gcmc_ml100k", "cluster_lp_arxiv",
    "molhiv_gcn", "molhiv_gcn_b128", "molhiv_gcn_b256", "molhiv_gcn_scatter",
    "ns_sage_reddit", "ns_gat_reddit", "reddit_gat", "proteins_rgcn",
    "cluster_gat_products", "products_sage", "cluster_sage_products", "ppa_gcn",
]

# Health = steady-state DISPATCH latency of one cached jit (the thing a
# training epoch is made of), NOT compile latency: a fresh-process compile
# rides the host CPU + tunnel and can sit at ~800ms even when the chip is
# perfectly healthy (measured 2026-08-18: compile 837ms, dispatch 0.03ms).
# The probe must include a device->host VALUE FETCH: the pool has a failure
# mode where dispatch + block_until_ready succeed but any readback hangs and
# eventually surfaces as "UNAVAILABLE: TPU device error" (measured
# 2026-08-20: killed products_sage twice at the first float(loss) while the
# dispatch-only probe kept reporting 0 ms). Every driver syncs through
# float(loss), so a pool that can't read back is dark for our purposes.
# Round-5 refinement: the pool charges ~60s for the FIRST readback of a
# process when it lands after a queued dispatch burst, but only ~1.3s for an
# immediate tiny fetch (measured 2026-08-20: tiny-first 1.3s then post-loop
# 1.1s, vs no-warm first fetch 58s). That is a fixed per-process tax every
# driver now prepays via warm_readback(), NOT a dark pool — so the probe
# must warm the readback path first (untimed; the subprocess timeout still
# catches the true-hang mode) and report only steady-state cost.
# Emits two numbers:
#   bulk_ms — worst of (dispatch/iter, amortized drain/iter, steady fetch):
#             cost floor for rows whose epoch is one or two big dispatches
#   step_ms — amortized cost of one QUEUED op when the work actually
#             executes (drain/20) — the per-minibatch tax that poisons
#             step-loop rows (GC batch loops, NS, gcmc, tiny full-graph)
# 2026-08-20 degraded-tunnel mode measures bulk≈55 step≈52; the 08-18
# healthy window measured dispatch 0.03ms → step well under 2.
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
    "t2=time.time();"
    "drain=float(jnp.max(r.astype(jnp.float32)));"
    "t_drain=(time.time()-t2)*1000;"
    "t3=time.time();"
    "v=float(jnp.max(r.astype(jnp.float32)));"
    "fetch=(time.time()-t3)*1000;"
    "print('PROBE_MS', max(d, t_drain/20, fetch), max(d, t_drain/20))"
)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def set_state(s):
    with open(STATE, "w") as f:
        f.write(s)


def probe_ms(timeout=120):
    """(bulk_ms, step_ms) steady-state costs, or (None, None) if dark/hung."""
    try:
        p = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None, None
    for ln in p.stdout.splitlines():
        if ln.startswith("PROBE_MS"):
            parts = ln.split()
            return float(parts[1]), float(parts[2])
    return None, None


def load_results():
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return []


def merge_row(row):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    rows = [r for r in load_results() if r["workload"] != row["workload"]]
    rows.append(row)
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    os.replace(tmp, RESULTS)


def missing_rows():
    done = {r["workload"] for r in load_results() if row_done(r)}
    return [r for r in ROW_ORDER if r not in done]


def run_row(name, timeout):
    out_dir = f"/tmp/suite_row_{name}"
    cmd = [sys.executable, os.path.join(REPO, "benchmarks", "generate_result.py"),
           "--suite", "full", "--only", name, "--out", out_dir,
           "--timeout", str(timeout), "--retries", "0"]
    set_state(f"running:{name}")
    try:
        subprocess.run(cmd, timeout=timeout * 3 + 600,
                       stdout=open(f"/tmp/suite_row_{name}.log", "w"),
                       stderr=subprocess.STDOUT)
    except subprocess.TimeoutExpired:
        log(f"{name}: watchdog timeout")
        return None
    finally:
        set_state("waiting")
    try:
        with open(os.path.join(out_dir, "results.json")) as f:
            rows = json.load(f)
        return rows[0] if rows else None
    except (OSError, json.JSONDecodeError):
        return None


# rows whose full protocol needs more than the default per-row budget;
# applied as max(override, ROW_TIMEOUT) so an operator-shrunk ROW_TIMEOUT
# can never give the heavy rows LESS time than the light ones
ROW_TIMEOUT_OVERRIDE = {
    "reddit_gat": 3600, "products_sage": 3600, "proteins_rgcn": 3600,
    "cluster_sage_products": 3600, "cluster_gat_products": 3600,
}

# Rows whose published number is dominated by per-dispatch latency — tiny
# full-graph epochs (one dispatch ≈ the whole epoch), minibatch step loops
# (GC: ~514 steps/epoch on molhiv; NS: ~190; gcmc per-iter). Under the
# degraded-tunnel mode (step ≈ 50ms vs 0.03ms healthy) these rows would
# publish numbers 10-30x worse than the framework's, so they only run in a
# truly healthy window; the bulk rows (multi-second epochs of a few big
# dispatches) run whenever the pool is merely usable.
# Round 5: EMPTY. Every timing pass is now amortized (--scan-epochs on the
# NC tiers, --scan-steps + --fetch-every on GC, --scan-iters on gcmc), so
# the degraded-mode tax is <=1.2ms/epoch on the tiny rows — and a fresh
# number with its probe_ms annotation beats a never-measured row (round 4's
# failure mode was waiting for a healthy window that never came). If a
# truly-healthy window appears, delete tiny rows from results.json and let
# the watcher re-measure them there (each costs ~2-4 min).
STEP_SENSITIVE = set()
STEP_HEALTHY_MS = float(os.environ.get("STEP_HEALTHY_MS", "2"))


def row_done(row):
    """The done-predicate missing_rows() uses: ok status AND a timing."""
    return bool(row) and row.get("status") == "ok" and row.get("time_per_epoch")


def main():
    deadline = time.time() + float(os.environ.get("WATCH_HOURS", "10")) * 3600
    row_timeout = int(os.environ.get("ROW_TIMEOUT", "2400"))
    # SUITE_ROWS=a,b,c scopes the watcher to a row subset (e.g. run the
    # non-lane rows while kernel work is still landing on the lane rows)
    only = [s for s in os.environ.get("SUITE_ROWS", "").split(",") if s]
    attempts = {}  # rows that timed out/failed rotate to the back, max 2 tries
    while time.time() < deadline:
        todo = [r for r in missing_rows() if attempts.get(r, 0) < 2
                and (not only or r in only)]
        if not todo:
            log("all rows recorded or exhausted — done")
            set_state("done")
            return
        ms, step = probe_ms()
        # 150ms: the degraded-tunnel mode steadies at ~55ms/iter (usable for
        # bulk rows); the hang/6x modes measure far above or time out
        if ms is None or ms > 150:
            set_state("waiting")
            log(f"pool dark/slow (probe={ms}); {len(todo)} rows queued")
            time.sleep(180)
            continue
        if step > STEP_HEALTHY_MS:
            eligible = [r for r in todo if r not in STEP_SENSITIVE]
            if not eligible:
                set_state("waiting")
                log(f"pool usable-not-healthy (step={step:.1f}ms); only "
                    f"step-sensitive rows remain ({len(todo)}) — waiting")
                time.sleep(180)
                continue
        else:
            eligible = todo
        name = min(eligible, key=lambda r: (attempts.get(r, 0), ROW_ORDER.index(r)))
        log(f"pool ok (bulk={ms:.0f}ms step={step:.1f}ms) -> running {name}")
        row = run_row(name, max(ROW_TIMEOUT_OVERRIDE.get(name, 0), row_timeout))
        # count the attempt against the SAME predicate missing_rows() uses —
        # an exit-0 row with no scraped timing must not be retried forever
        if not row_done(row):
            attempts[name] = attempts.get(name, 0) + 1
            log(f"{name}: {'no result' if row is None else row.get('status')} "
                f"time/epoch={row.get('time_per_epoch') if row else None} "
                f"(attempt {attempts[name]}/2)")
            # failures stay in the scratch per-row logs, NOT the published
            # results file (advisor r2): merge only rows that carry signal
            time.sleep(10)
            continue
        # carry the pool state the row was measured under into the table —
        # a reader can tell a degraded-window number from a healthy one
        row["probe_ms"] = round(ms, 1)
        row["probe_step_ms"] = round(step, 2)
        merge_row(row)
        log(f"{name}: {row.get('status')} time/epoch={row.get('time_per_epoch')} "
            f"test={row.get('final_test')} vs_v100={row.get('vs_dgl_v100')}")
    log("watch window expired")
    set_state("expired")


if __name__ == "__main__":
    main()
