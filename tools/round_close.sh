#!/usr/bin/env bash
# Round-close measurement sequence on the real TPU chip.
#
# Encodes the ORDER the measurements must run in (PERFORMANCE.md
# cold-start section; memory of rounds 3-4):
#   0. health-probe the axon tunnel with a bounded tiny-matmul —
#      when the relay is down, backend init hangs forever;
#   1. tools/kp_bench.py FIRST: the lbfgs_perframe number decides
#      whether config grows a TPU guard (a traced-code edit, which
#      invalidates the source-line-sensitive compile cache — so it
#      must happen BEFORE prewarm, never after);
#   2. tools/prewarm.py from an EMPTY cache: the measured cold-start
#      number for the round artifact (re-measures the r4
#      program-budget cut: local_a/global_a share one executable);
#   3. bench.py: the full round artifact (headline + extras), warm;
#   4. tools/hbm_probe.py LAST: it intentionally drives the chip to
#      OOM, which can wedge the tunnel — nothing may run after it.
#
# ONE TPU client at a time: never run any step concurrently with
# another TPU process.
set -u
cd "$(dirname "$0")/.."
mkdir -p .round_close

probe() {
    timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe:", jax.default_backend(), float((x @ x)[0, 0]))
EOF
}

echo "[round_close] step 0: tunnel probe"
if ! probe; then
    echo "[round_close] tunnel DOWN — aborting (retry later)" >&2
    exit 1
fi

echo "[round_close] step 1: kp_bench (lbfgs_perframe decision)"
timeout 3600 python tools/kp_bench.py 2>&1 | tee .round_close/kp_bench.log
echo "[round_close] >>> if lbfgs_perframe < 50 f/s: add the TPU guard"
echo "[round_close] >>> in config.py NOW, re-run this script from step 2."

echo "[round_close] step 2: prewarm from an empty cache"
rm -rf .jax_cache
timeout 7200 python tools/prewarm.py 2>&1 | tee .round_close/prewarm.log

echo "[round_close] step 3: full bench"
timeout 7200 python bench.py 2>&1 | tee .round_close/bench.log

echo "[round_close] step 4 (LAST, OOM risk): hbm probe"
timeout 7200 python tools/hbm_probe.py 2>&1 | tee .round_close/hbm_probe.log

echo "[round_close] done — logs in .round_close/, results in bench_out.json"
