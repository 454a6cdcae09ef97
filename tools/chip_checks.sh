#!/bin/bash
# On-chip validation sequence (light -> heavy), for a session with a
# healthy tunnel worker. Probe first:
#   timeout 120 python -c "import jax; print(jax.devices())"
# Each stage logs to /tmp/chip_*.log; heavy compiles go last so a worker
# crash costs the least (see .claude/skills/verify/SKILL.md gotchas).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# 1. smoke suite (small compiles) incl. the auto-routing parity test
timeout 900 env EVFLOW_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q \
  2>&1 | tail -6 | tee /tmp/chip_smoke.log

# 2. A/B the UNMEASURED in-model fused-LIF shapes (rec c128@32^2, c512@8^2);
#    update models/policy.py::fused_auto_wins from the results
timeout 600 python tools/ab_fused_lif.py --hw 32 --c 128 --cells rec \
  --variants xla,pallas --iters 3 2>&1 | tail -4 | tee /tmp/chip_ab_c128.log
timeout 600 python tools/ab_fused_lif.py --hw 8 --c 512 --cells rec \
  --variants xla,pallas --iters 3 2>&1 | tail -4 | tee /tmp/chip_ab_c512.log

# 3. SpikingRecEVFlowNet full-update A/B: default (xla cells) vs auto;
#    on a win, add EVFLOW_CELL_IMPL=auto to bench.py's fast-path env
for impl in xla auto; do
  timeout 1800 env EVFLOW_CELL_IMPL=$impl python - <<'PY' 2>&1 | tail -2 | tee -a /tmp/chip_unet_auto.log
import bench, json, os
rtt = bench._measure_rtt_s()
r = bench.bench_model("SpikingRecEVFlowNet", rtt)
print(os.environ.get("EVFLOW_CELL_IMPL"),
      json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in r.items()}))
PY
done

# 4. serialized serving artifact cross-platform check: export on CPU,
#    serve the same artifact on the chip, outputs must agree
timeout 900 python tools/serialized_crosscheck.py 2>&1 | tail -4 | tee /tmp/chip_serialized.log

# 4b. serving-precision A/B (f32 / bf16 / int8 convs): int8 runs the MXU
#     at 2x bf16 rate — measure whether that survives the 32-channel
#     lane padding at serving shapes
timeout 1200 python tools/bench_serving.py 2>&1 | tail -6 | tee /tmp/chip_serving.log

# 5. full bench (also warms /tmp/jaxcache for the driver's round-end run)
timeout 3600 python bench.py 2>&1 | tail -3 | tee /tmp/chip_bench.log
