#!/bin/bash
# One-shot TPU measurement battery for the round-3 planner rework.
# Runs every queued on-hardware measurement sequentially (one TPU process at
# a time), each to its own log under /tmp/tpu_battery/.
#
# Usage: bash tools/tpu_battery.sh
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
OUT=/tmp/tpu_battery
mkdir -p $OUT
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" | tee -a $OUT/battery.log
  timeout "$TMO" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? (end $(date +%H:%M:%S))" | tee -a $OUT/battery.log
}

# 1. kernel A/B on the real seam-heavy demo uv: auto pick (new small windows)
#    vs forced round-2 sizes — decides whether choose_region's cost model
#    needs recalibration.
TMO=3600 run kernel_ab python tools/demo_kernel_ab.py

# 2. DCE-free full-grad decomposition on the demo room at V=4.
TMO=3600 ANATOMY_DEMO=1 run gap_probe python tools/demo_gap_probe.py 4

# 3. headline bench (synthetic + demo-room JSON metrics).
TMO=5400 run bench python bench.py

# 4. warm-cache full-preset end-to-end demo-room run -> wallclock.json table.
#    /tmp gets wiped between sessions; rebake the seam-heavy demo scene when
#    absent (~3 min, CPU-side).
if [ ! -d /tmp/demo_room/train ]; then
  TMO=1800 run make_demo python tools/make_demo_scene.py /tmp/demo_room 24
fi
TMO=5400 run e2e_warm python -m stylemesh_tpu.cli --preset scannet_full \
  --root_path /tmp/demo_room --scene scene0900_00 \
  --style_image_path /root/reference/styles/120styles/14-2.jpg \
  --batch_size 4 --bfloat16 --log_dir $OUT/demo_run
echo "battery done $(date)" | tee -a $OUT/battery.log
